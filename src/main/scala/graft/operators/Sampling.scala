package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Weighted systematic sampling over a deterministic global order — the
  * "sample documents proportional to length/quality" primitive of a
  * training-data mix, reproducible across engines, runs, and
  * partitionings (no RNG state, integer arithmetic only).
  *
  * A row is selected when its weight interval crosses a stride boundary of
  * the GLOBAL running weight sum, so selection probability ∝ weight and
  * the sample pace is exactly one row per `stride` weight units.
  *
  * The global running sum is the scalable two-pass shape, not a
  * single-partition window: rows order by (md5 bucket-prefix, md5, id) —
  * a hash order, which also decorrelates the sample from insertion order —
  * so the 256 md5-prefix buckets are contiguous ranges of the global
  * order. Pass 1 computes per-bucket totals (256 rows — metadata scale at
  * ANY corpus size) and turns them into bucket offsets on the driver;
  * pass 2 adds a within-bucket window cumsum to the broadcast offset.
  * No global sort, no single-partition shuffle. */
object Sampling {

  def weightedSystematic(df: DataFrame, idCol: String, weightCol: String,
                         stride: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol),
        col(weightCol).cast(LongType).as("__w"),
        md5(col(idCol).cast(StringType)).as("__h"))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val totals = base.groupBy("__b").agg(sum(col("__w")).as("__t"))
      .orderBy("__b").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var acc = 0L
    val offsets = totals.toSeq.map { case (b, t) =>
      val o = (b, acc); acc += t; o
    }
    val offDf = broadcast(offsets.toDF("__b", "__off"))
    val w = Window.partitionBy("__b").orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer DIV, not double division: cum grows with the corpus and
    // double-rounded boundaries would misplace selections past 2^53
    base.join(offDf, Seq("__b"))
      .withColumn("cum", sum(col("__w")).over(w) + col("__off"))
      .filter(expr(s"cum DIV ${stride}L") >
        expr(s"(cum - __w) DIV ${stride}L"))
      .select(col(idCol), col("__w").as("weight"), col("cum"))
  }

  /** Quota-exact MIXTURE UPSAMPLING — the "epochs per source" knob of a
    * training-data recipe (books ×2.5 epochs, web ×1, low-resource
    * languages ×2…): every row of group g is replicated so the group's
    * total replica count is EXACTLY ⌊n_g·num_g/den_g⌋, with the ⌊⌋/⌈⌉
    * split decided deterministically by each row's position in the
    * group's hash order — no RNG state, bit-identical across engines,
    * runs, and partitionings. Fractional rates < 1 downsample (rows get
    * 0 or 1 replicas), rates > 1 upsample (⌊rate⌋ or ⌈rate⌉ replicas):
    * row at 0-based position p gets ⌊(p+1)·num/den⌋ − ⌊p·num/den⌋
    * replicas, which telescopes to the exact group quota — unlike a
    * hash-threshold resampler, the realized mixture cannot drift from
    * the recipe by sampling noise.
    *
    * The within-group position reuses [[weightedSystematic]]'s two-pass
    * global-order shape: per-(group, md5-prefix-bucket) totals (256
    * rows per group — metadata scale at any corpus size) become driver
    * prefix offsets, and a within-bucket window adds the local rank — no
    * global sort, no single-partition window. Integer headroom:
    * (p+1)·num < 2⁶³ ⇒ fine to ~9·10¹⁸/num rows per group.
    *
    * @param rates (num, den) replication rate per group value; groups
    *              absent from the map use `defaultRate`
    * @return (idCol, groupCol, replica) with replica ∈ 1..k(row) — rows
    *         with 0 replicas are absent
    */
  def mixtureEpochs(df: DataFrame, idCol: String, groupCol: String,
                    rates: Map[String, (Long, Long)],
                    defaultRate: (Long, Long) = (1L, 1L)): DataFrame = {
    require(rates.values.forall { case (n, d) => n >= 0 && d > 0 } &&
      defaultRate._1 >= 0 && defaultRate._2 > 0,
      "rates must be non-negative with positive denominators")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol), col(groupCol).as("__g"),
        md5(col(idCol).cast(StringType)).as("__h"))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val totals = base.groupBy("__g", "__b").agg(count(lit(1)).as("__t"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // buckets are md5 prefixes, so within a group they are contiguous
    // ranges of the (md5, id) hash order: bucket-ascending running totals
    // are exactly the global within-group offsets
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, b, t) =>
        val o = (g, b, acc); acc += t; o
      }
    }
    val offDf = broadcast(offsets.toDF("__g", "__b", "__off"))
    val rateDf = broadcast(rates.toSeq.map { case (g, (n, dn)) => (g, n, dn) }
      .toDF("__g", "__num", "__den"))
    val w = Window.partitionBy("__g", "__b").orderBy(col("__h"), col(idCol))
    base.join(offDf, Seq("__g", "__b"))
      .join(rateDf, Seq("__g"), "left")
      .na.fill(Map("__num" -> defaultRate._1, "__den" -> defaultRate._2))
      .withColumn("__p",
        row_number().over(w).cast(LongType) - lit(1L) + col("__off"))
      .withColumn("__k", // non-negative operands: Spark div == DuckDB //
        expr("((__p + 1) * __num) div __den") - expr("(__p * __num) div __den"))
      .filter(col("__k") >= 1L)
      .select(col(idCol), col("__g").as(groupCol),
        explode(sequence(lit(1L), col("__k"))).as("replica"))
  }

  /** Temperature-based mixture resampling — the "flatten the source/language
    * mix" step of a training-data recipe (sample group g at rate ∝
    * count(g)^α / count(g), α = 0.5): over-represented groups are
    * down-sampled toward the temperature-flattened mixture, scaled so the
    * expected kept total is `num/den` of the corpus.
    *
    * Determinism (no RNG state, identical across engines/runs/
    * partitionings): α is pinned at 0.5 because IEEE sqrt is correctly
    * rounded in every engine (pow is not); weights floor onto a 1e3 integer
    * grid; the keep rate becomes an integer threshold on the 24-bit md5
    * prefix of the id (fixed-width lowercase hex compares lexicographically
    * = numerically). Rates ≥ 1 keep the whole group (the `thr >= 16^6`
    * disjunct — a capped threshold's hex would be 7 chars wide and break
    * the string compare).
    *
    * Scale: group stats are metadata-scale (one hash agg + broadcast back);
    * the per-row decision is one codegen'd expression — no extra shuffle of
    * the corpus. Integer headroom: (total·num/den)·wt·16^6 must stay below
    * 2^63 — holds to ~10^8 docs per run at the 1e3 weight grid; beyond
    * that, drop the weight grid to 1e2 or accumulate in DECIMAL(38,0). */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
                        num: Long = 1L, den: Long = 2L): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .withColumn("wt", floor(sqrt(col("n")) * lit(1000)).cast(LongType))
    val tot = counts.agg(sum(col("wt")).as("wsum"), sum(col("n")).as("total"))
    val thr = broadcast(counts.crossJoin(broadcast(tot))
      .withColumn("thr", least(lit(16777216L),
        expr(s"((total * ${num}L DIV ${den}L) * wt * 16777216L) DIV (wsum * n)")))
      .select(col(groupCol), col("n").as("n_group"), col("thr")))
    df.join(thr, Seq(groupCol))
      .filter(col("thr") >= lit(16777216L) ||
        substring(md5(col(idCol).cast(StringType)), 1, 6) <
          lpad(lower(hex(col("thr"))), 6, "0"))
      .select(col(idCol), col(groupCol), col("n_group"), col("thr"))
  }
}
