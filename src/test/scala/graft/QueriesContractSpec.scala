package graft

/** Driver-contract invariants over the whole declared inventory — the
  * regression guard for careless additions:
  *  - every oracle key maps to a declared query (typo guard);
  *  - every declared query builds, executes at sf0.001, and is nonempty
  *    (the driver's rows-only check would silently weaken on empties);
  *  - every query result is globally ordered (BASELINE.md determinism
  *    contract) — verified by the presence of a top-level Sort in the
  *    optimized plan, except intentionally-aggregated single-row outputs.
  */
class QueriesContractSpec extends SparkSpec {

  private val singleRowKeys = Set("q_count",
    "q_graph_triangles") // one aggregate row (n_triangles, n_wedges)

  test("oracle keys are a subset of declared query keys") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracle SQL without a query: $undeclared")
  }

  test("gaps-and-islands sessionization agrees with session_window per user") {
    import org.apache.spark.sql.functions._
    val islands = Queries.qSessionIslands(spark, sf())
      .groupBy("user_id").agg(max("session_seq").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val windows = Queries.qSessionWindow(spark, sf())
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(islands === windows,
      "per-user session counts diverge between the two formulations")
  }

  test("approx_count_distinct stays within the HLL rsd envelope per group") {
    // q_agg_approx_distinct is rows-only (HLL estimates are engine-specific,
    // no cross-engine oracle exists) — but rows-only alone would accept a
    // broken sketch returning 3 arbitrary numbers. This bounds the estimate
    // against exact count_distinct at the declared query's default rsd
    // (0.05): deterministic data + deterministic HLL++ ⇒ no flake.
    import org.apache.spark.sql.functions._
    val errs = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect().map { r =>
        val a = r.getAs[Long]("approx")
        val e = r.getAs[Long]("exact")
        (r.getAs[String]("l_returnflag"), a, e, math.abs(a - e).toDouble / e)
      }
    assert(errs.length >= 3, "lineitem fixture lost its return-flag groups")
    errs.foreach { case (g, a, e, rel) =>
      info(f"group $g: approx=$a exact=$e rel_err=$rel%.4f")
      assert(rel <= 0.05,
        f"approx_count_distinct drifted past the rsd envelope for group $g: " +
          f"approx=$a exact=$e rel_err=$rel%.4f")
    }
  }

  test("approx_percentile stays within its rank-error bound per group") {
    // q_agg_approx_percentile is rows-only (quantile sketches are
    // engine-specific) — this bounds it instead, in RANK space, which is
    // what the sketch actually guarantees: accuracy 10000 ⇒ rank error
    // ≤ ⌈n/10000⌉, plus one rank of slack because approx_percentile
    // returns a real data value while the target rank p·n is fractional.
    import org.apache.spark.sql.functions._
    val approx = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("a99"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("a50"), r.getAs[Double]("a99"))).toMap
    assert(approx.size >= 3, "lineitem fixture lost its return-flag groups")
    // exact per-group sorted values (fixture-scale collect, spec only)
    val exact = Tables.lineitem(spark, sf())
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted }
    approx.foreach { case (g, (a50, a99)) =>
      val vs = exact(g); val n = vs.length
      val m = n / 10000 + 2 // sketch rank error + value-vs-rank slack
      def sandwich(a: Double, p: Double, label: String): Unit = {
        val r = (p * (n - 1)).toInt
        val lo = vs(math.max(0, r - m)); val hi = vs(math.min(n - 1, r + m))
        info(f"group $g $label: approx=$a in [$lo, $hi] (n=$n, ±$m ranks)")
        assert(a >= lo && a <= hi,
          s"$label estimate outside ±$m ranks for group $g: $a not in [$lo, $hi]")
      }
      sandwich(a50, 0.5, "median")
      sandwich(a99, 0.99, "p99")
    }
  }

  test("point-in-time join matches every fact to exactly one dimension version") {
    import org.apache.spark.sql.functions._
    // the leakage-free contract: SCD2 intervals partition each key's
    // timeline, so n(results) == n(facts) with no duplicates — a fact
    // matching 0 versions (gap) or 2 (overlap) is an interval bug
    val pit = Queries.qJoinPointInTime(spark, sf())
    val nFacts = Tables.events(spark, sf())
      .filter(col("event_type") === "purchase").count()
    assert(pit.count() === nFacts, "one enriched row per purchase")
    assert(pit.select("event_id").distinct().count() === nFacts,
      "no fact may match two versions")
    // no leakage by construction: every matched version starts at-or-before
    // the fact's timestamp
    val leaked = pit.join(
        Tables.events(spark, sf()).select(col("event_id"), col("ts")),
        "event_id")
      .filter(col("valid_from") > col("ts")).count()
    assert(leaked === 0L, "a version from the future leaked into a fact")
  }

  test("attribution credits sum to exactly one million ppm per conversion") {
    import org.apache.spark.sql.functions._
    val bad = Queries.qAttribution(spark, sf())
      .groupBy("purchase_id").agg(sum("credit_ppm").as("total"))
      .filter(col("total") =!= 1000000L)
    assert(bad.isEmpty, s"non-conserving conversions: ${bad.count()}")
  }

  test("every declared query executes nonempty at sf0.001 and is ordered") {
    val dir = sf()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val ordered = singleRowKeys.contains(name) ||
          df.queryExecution.optimizedPlan.collectFirst {
            case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
          }.isDefined
        val n = df.count()
        (if (n == 0) Seq(s"$name: EMPTY") else Nil) ++
          (if (!ordered) Seq(s"$name: NO GLOBAL ORDER") else Nil)
      } catch {
        case e: Exception => Seq(s"$name: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
