package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Measured recall of the approximate ANN paths against brute force on the
  * real embeddings fixture — documents the quality/cost trade instead of
  * only testing plumbing. Measured on this corpus: IVF(16 cells, probe 6,
  * 1 Lloyd iter) = 0.96, LSH(4 planes × 8 OR-tables) = 0.62; every path is
  * deterministic (fixed seeds, decimal-exact means) so the floors can sit
  * close to the measurements without flaking. */
class AnnRecallSpec extends SparkSpec {

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }

  test("IVF and LSH recall@10 against brute force") {
    val emb = graft.Tables.embeddings(spark, sf()) // 500 × 64-dim
    val queries = emb.filter(col("vec_id") < 10)
    val exact = topkSets(VectorOps.cosineTopK(emb, queries, "vec_id", "embedding", 10))
    // measured sweep on this fixture: Lloyd iters beyond 1 HURT recall
    // (random vectors have no cluster structure to converge to) while
    // probe 4→6 lifts it — 1 iter × probe 6 ⇒ 0.96, deterministic
    val ivf = topkSets(VectorOps.cosineTopKIvf(emb, queries, "vec_id", "embedding", 10,
      nCentroids = 16, nProbe = 6, kmeansIters = 1))
    val lsh = topkSets(VectorOps.cosineTopKLsh(emb, queries, "vec_id", "embedding", 10,
      nPlanes = 4, tables = 8))

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) =>
        approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    val rIvf = recall(ivf)
    val rLsh = recall(lsh)
    info(f"recall@10 — IVF(16 cells, probe 6, 1 Lloyd iter): $rIvf%.2f, " +
      f"LSH(4 planes × 8 tables): $rLsh%.2f")
    assert(rIvf >= 0.95, s"IVF recall regressed: $rIvf")
    assert(rLsh >= 0.6, s"LSH recall regressed: $rLsh")

    // multiprobe: 4 tables + flipped-bit probes per table should recover
    // most of what 8 tables buy, at HALF the corpus index size; probes=4
    // (all single-bit flips at 4 planes) is the declared query's config
    val mp = topkSets(VectorOps.cosineTopKLsh(emb, queries, "vec_id", "embedding", 10,
      nPlanes = 4, tables = 4, probes = 2))
    val mp4 = topkSets(VectorOps.cosineTopKLsh(emb, queries, "vec_id", "embedding", 10,
      nPlanes = 4, tables = 4, probes = 4))
    val base4 = topkSets(VectorOps.cosineTopKLsh(emb, queries, "vec_id", "embedding", 10,
      nPlanes = 4, tables = 4))
    val rMp = recall(mp)
    val rMp4 = recall(mp4)
    val rBase = recall(base4)
    info(f"LSH multiprobe — 4 tables plain: $rBase%.2f, +2 probes: $rMp%.2f, " +
      f"+4 probes: $rMp4%.2f")
    assert(rMp >= rBase, "multiprobe candidates are a superset — recall cannot drop")
    assert(rMp4 >= rMp, "more probes are a superset — recall cannot drop")
    assert(rMp >= 0.5, s"multiprobe recall collapsed: $rMp")
    assert(rMp4 >= 0.75, s"declared-config (probes=4) recall regressed: $rMp4")

    // PQ/ADC with exact re-rank: compressed-domain scan (4 codes instead of
    // 64 floats) + refine×k exact re-rank
    val pq = topkSets(VectorOps.cosineTopKPq(emb, queries, "vec_id", "embedding", 10,
      m = 4, ksub = 16, refine = 4))
    val rPq = recall(pq)
    val pq8 = topkSets(VectorOps.cosineTopKPq(emb, queries, "vec_id", "embedding", 10,
      m = 8, ksub = 16, refine = 4))
    val rPq8 = recall(pq8)
    val pq8r8 = topkSets(VectorOps.cosineTopKPq(emb, queries, "vec_id", "embedding", 10,
      m = 8, ksub = 16, refine = 8))
    val rPq8r8 = recall(pq8r8)
    info(f"PQ recall@10 — m=4: $rPq%.2f, m=8: $rPq8%.2f, m=8+refine=8: $rPq8r8%.2f")
    assert(rPq >= 0.5, s"PQ m=4 recall regressed: $rPq")
    assert(rPq8 >= 0.65, s"PQ m=8 recall regressed: $rPq8")
    // the declared query's pinned config
    assert(rPq8r8 >= 0.85, s"PQ m=8 refine=8 recall regressed: $rPq8r8")

    // IVF-PQ at the declared q_vec_ann_ivfpq config — the most intricate
    // path (residual PQ + ADC cross-terms + exact re-rank) and the one a
    // silent sign bug in the cross-term would NOT crash: it would just
    // return 50 plausible rows, which the rows-only gate can't catch. The
    // quantitative floor is the check. Measured 0.91 on this fixture.
    val ivfpq = topkSets(VectorOps.cosineTopKIvfPq(emb, queries, "vec_id", "embedding", 10,
      nCentroids = 16, nProbe = 4, m = 8, ksub = 16, refine = 8))
    val rIvfPq = recall(ivfpq)
    info(f"IVF-PQ recall@10 (16 cells, probe 4, m=8, refine=8): $rIvfPq%.2f")
    assert(rIvfPq >= 0.85, s"IVF-PQ declared-config recall regressed: $rIvfPq")

    // INT8 quantized scan at the declared q_vec_ann_int8 config: 8-bit
    // symmetric quantization loses almost none of cosine's ordering, and
    // refine=5 re-ranks exactly — the floor sits far above every other
    // approximate path's
    val int8 = topkSets(VectorOps.cosineTopKInt8(emb, queries, "vec_id",
      "embedding", 10, refine = 5))
    val rInt8 = recall(int8)
    info(f"INT8 recall@10 (refine=5): $rInt8%.2f")
    assert(rInt8 >= 0.97, s"INT8 declared-config recall regressed: $rInt8")

    // NORM HETEROGENEITY: cosine is scale-invariant but a raw-dot
    // candidate ranking is not — shrink every 7th vector 20× and the
    // norm-corrected rank key (intdot/√Σc²) must still retrieve them
    // (a raw-dot ranking drops every shrunk vector out of the
    // candidate set and recall collapses)
    val het = emb.withColumn("embedding", transform(col("embedding"),
      x => (x * when(col("vec_id") % 7 === 0, lit(0.05f))
        .otherwise(lit(1.0f))).cast("float")))
    val hq = het.filter(col("vec_id") < 10)
    val exactHet = topkSets(VectorOps.cosineTopK(het, hq, "vec_id", "embedding", 10))
    val int8Het = topkSets(VectorOps.cosineTopKInt8(het, hq, "vec_id", "embedding", 10))
    val perHet = exactHet.map { case (q, ex) =>
      int8Het.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0) }
    val rHet = perHet.sum / perHet.size
    info(f"INT8 recall@10 under 20× norm heterogeneity: $rHet%.2f")
    assert(rHet >= 0.95, s"INT8 norm-corrected recall regressed: $rHet")
  }

  test("planesFor keeps bucket size bounded as the corpus grows") {
    assert(VectorOps.planesFor(2000, 125) === 4)     // this fixture's setting
    assert(VectorOps.planesFor(100000000L, 1000) === 17)
    assert(VectorOps.planesFor(100, 1000) === 1)     // tiny corpus: floor at 1
    // expected bucket size stays ≤ target across 6 orders of magnitude
    Seq(1000L, 1000000L, 1000000000L).foreach { n =>
      val p = VectorOps.planesFor(n, 1000)
      assert(n.toDouble / math.pow(2, p) <= 1000.0)
    }
  }

  test("cosineNearDups: LSH plan has no cartesian/BNLJ; recall vs all-pairs truth") {
    val emb = graft.Tables.embeddings(spark, sf())
    val lsh = VectorOps.cosineNearDups(emb, "vec_id", "embedding", threshold = 0.3)
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "near-dup candidate join must be an equi-join on (table, bucket):\n" + plan)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val got = pairs(lsh)
    val truth = pairs(VectorOps.cosineNearDupsExact(emb, "vec_id", "embedding", 0.3))
    // no false positives possible: every candidate is exact-cosine verified
    assert((got -- truth).isEmpty, "LSH near-dups produced pairs below threshold")
    val recall = if (truth.isEmpty) 1.0 else (got & truth).size.toDouble / truth.size
    info(f"near-dup recall at weak threshold 0.3: $recall%.2f over ${truth.size} true pairs")
    // 0.3 is far below the sign-LSH sweet spot (p_plane ≈ 0.6 ⇒ table hit
    // ≈ 0.13); the floor documents the measured trade without flaking
    assert(recall >= 0.2, s"near-dup recall collapsed: $recall")

    // the regime dedup actually targets — strong near-dups (planted by
    // perturbing fixture vectors) must be found with high recall
    import org.apache.spark.sql.functions._
    val base = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
    val dup = base.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"))
    val strong = VectorOps.cosineNearDups(base.unionByName(dup), "vec_id", "embedding",
      threshold = 0.99)
    val found = pairs(strong).count { case (a, b) => b == a + 100000L }
    info(s"planted-duplicate recall at threshold 0.99: $found/50")
    assert(found >= 45, s"strong near-dup recall too low: $found/50")
  }

  test("cosineNearDups recall floor at the declared 0.9 near-dup regime") {
    // the scaladoc claims "cosine ≥ 0.9 ⇒ ~0.96 recall at 4 planes × 4
    // tables" — this measures it against cosineNearDupsExact ground truth
    // instead of leaving it prose. Planted near-dups: v' = v + 0.35·rot(v)
    // puts pair cosine ≈ 0.94 (direction change, not a scale — scaling is
    // cosine-invariant), inside the ≥0.9 dedup regime.
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf())
    val base = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
    val rot = transform(col("embedding"), (x, i) =>
      x + lit(0.35f) * element_at(col("embedding"), (i + lit(1)) % lit(64) + lit(1)))
    val dup = base.select((col("vec_id") + 100000L).as("vec_id"),
      rot.as("embedding"))
    val both = base.unionByName(dup).localCheckpoint()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val truth = pairs(VectorOps.cosineNearDupsExact(both, "vec_id", "embedding", 0.9))
    assert(truth.size >= 30, s"fixture planted too few ≥0.9 pairs: ${truth.size}")
    val got = pairs(VectorOps.cosineNearDups(both, "vec_id", "embedding",
      threshold = 0.9, nPlanes = 4, tables = 4))
    // every candidate is exact-cosine verified ⇒ false positives impossible
    assert((got -- truth).isEmpty, "near-dup pairs below the 0.9 threshold")
    val recall = (got & truth).size.toDouble / truth.size
    info(f"near-dup recall at threshold 0.9 (4 planes × 4 tables): " +
      f"$recall%.2f over ${truth.size} true pairs")
    assert(recall >= 0.9, s"declared-regime near-dup recall regressed: $recall")
  }

  test("cosineSimJoinLsh: A-x-B recall floor vs exact cross truth; cap semantics") {
    // two DIFFERENT id spaces: B = direction-perturbed clones of A
    // (cos ~ 0.94, the 0.9 alignment regime) — the cross-corpus version of
    // the near-dup fixture above
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf())
    val a = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
      .localCheckpoint()
    val rot = transform(col("embedding"), (x, i) =>
      x + lit(0.35f) * element_at(col("embedding"), (i + lit(1)) % lit(64) + lit(1)))
    val b = a.select((col("vec_id") + 100000L).as("vec_id"), rot.as("embedding"))
      .localCheckpoint()
    // exact A-x-B ground truth: brute-force cross pairs on the kernel grid
    import graft.plans.FloatVectorExpressions.{dot, norm}
    val truth = a.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .crossJoin(b.select(col("vec_id").as("id_b"), col("embedding").as("vb")))
      .withColumn("c", dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))))
      .filter(col("c") >= 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(truth.size >= 30, s"fixture planted too few cross pairs: ${truth.size}")
    val got = VectorOps.cosineSimJoinLsh(a, b, "vec_id", "embedding",
        threshold = 0.9, nPlanes = 4, tables = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // exact-verified candidates: false positives impossible
    assert((got -- truth).isEmpty, "sim-join pairs below the 0.9 threshold")
    val recall = (got & truth).size.toDouble / truth.size
    info(f"A-x-B sim-join recall at 0.9 (4 planes x 4 tables): $recall%.2f " +
      f"over ${truth.size} true pairs")
    assert(recall >= 0.9, s"sim-join recall regressed: $recall")
    // the hot-bucket cap drops whole cells BEFORE pairs materialize:
    // cap=1 keeps only single-occupant cells per side, a strict subset
    val capped = VectorOps.cosineSimJoinLsh(a, b, "vec_id", "embedding",
        threshold = 0.9, nPlanes = 4, tables = 4, maxBucket = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(capped.subsetOf(got))
  }

  test("knnGraphExact: prefilter keeps the full unfiltered fixed-point ranking") {
    import org.apache.spark.sql.expressions.Window
    val emb = graft.Tables.embeddings(spark, sf()).filter(col("vec_id") < 250)
    def tuples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      df.collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    // unfiltered truth: every directed pair on the fixed-point grid,
    // ranked by the identical (rounded cosine desc, id asc) total order
    val side = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("xnrm", sqrt(VectorOps.dotFixed(col("v"), col("v"))))
    val a = side.alias("a"); val b = side.alias("b")
    for (k <- Seq(3, 5, 10)) {
      val w = Window.partitionBy("node")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      val truth = tuples(a.join(b, col("a.id") =!= col("b.id"))
        .select(col("a.id").as("node"), col("b.id").as("neighbor_id"),
          round(VectorOps.dotFixed(col("a.v"), col("b.v")) /
            (col("a.xnrm") * col("b.xnrm")), 6).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k))
      val got = tuples(VectorOps.knnGraphExact(emb, "vec_id", "embedding", k))
      assert(got === truth, s"prefiltered knn graph != unfiltered truth at k=$k")
    }
  }

  test("knnGraphLsh recall vs the exact knn graph; prefix funnel recall vs brute force") {
    val emb = graft.Tables.embeddings(spark, sf()) // 500 × 64-dim
    def nbrSets(df: org.apache.spark.sql.DataFrame,
                nodeCol: String): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long](nodeCol))
        .map { case (n, rows) => n -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    def recall(approx: Map[Long, Set[Long]],
               exact: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) =>
        approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    // k-NN graph: declared config (3 planes × 6 tables, k=5) vs exact.
    // Random 64-dim neighbors sit near cos≈0.25 ⇒ per-table collision
    // (1−θ/π)³≈0.2; measured sweep: 4×4 ⇒ 0.40, 3×6 ⇒ 0.72
    val exactG = nbrSets(VectorOps.knnGraphExact(emb, "vec_id", "embedding", 5), "node")
    val lshG = nbrSets(VectorOps.knnGraphLsh(emb, "vec_id", "embedding", 5,
      nPlanes = 3, tables = 6), "node")
    val rG = recall(lshG, exactG)
    info(f"knn-graph recall@5 (3 planes × 6 tables): $rG%.2f over ${exactG.size} nodes")
    assert(rG >= 0.65, s"knn-graph LSH recall regressed: $rG")
    // hot-bucket cap: on this uniform fixture every cell is far below the
    // declared cap (1000), so capped output ≡ uncapped bit-for-bit; a cap
    // below the largest cell must strictly DROP candidates (never invent)
    val capG = nbrSets(VectorOps.knnGraphLsh(emb, "vec_id", "embedding", 5,
      nPlanes = 3, tables = 6, maxBucket = 1000), "node")
    assert(capG == lshG, "maxBucket=1000 must be a no-op on uniform buckets")
    val tiny = nbrSets(VectorOps.knnGraphLsh(emb, "vec_id", "embedding", 5,
      nPlanes = 3, tables = 6, maxBucket = 10), "node")
    val tinyPairs = tiny.toSeq.flatMap { case (n, s) => s.map(n -> _) }.toSet
    val fullPairs = lshG.toSeq.flatMap { case (n, s) => s.map(n -> _) }.toSet
    assert(tinyPairs.subsetOf(fullPairs) && tinyPairs.size < fullPairs.size,
      "an aggressive cap must drop (and only drop) candidate edges")

    // matryoshka funnel vs brute force — the funnel is deterministic, so
    // the floor can hug the measure. On this RANDOM fixture the prefix is
    // an untrained coarse embedding (MRL training is what concentrates
    // signal in the prefix), so recall is the pessimistic bound: measured
    // 16 dims ⇒ 0.46 (refine 4) / 0.61 (refine 8); 32 dims below.
    val queries = emb.filter(col("vec_id") < 10)
    val bf = topkSets(VectorOps.cosineTopK(emb, queries, "vec_id", "embedding", 10))
    for ((pd, rf) <- Seq((32, 4), (32, 8))) {
      val pf = topkSets(VectorOps.cosineTopKPrefix(emb, queries, "vec_id",
        "embedding", prefixDims = pd, k = 10, refine = rf))
      info(f"prefix-funnel recall@10 — prefix $pd, refine $rf: ${recall(pf, bf)}%.2f")
    }
    val pf = topkSets(VectorOps.cosineTopKPrefix(emb, queries, "vec_id",
      "embedding", prefixDims = 32, k = 10, refine = 8))
    val rP = recall(pf, bf)
    // widening the funnel is a superset of candidates — recall cannot drop
    val pf16 = topkSets(VectorOps.cosineTopKPrefix(emb, queries, "vec_id",
      "embedding", prefixDims = 32, k = 10, refine = 16))
    val rP16 = recall(pf16, bf)
    info(f"prefix-funnel recall@10 — refine 16: $rP16%.2f")
    assert(rP16 >= rP, "wider funnel candidates are a superset — recall cannot drop")
    assert(rP >= 0.6, s"prefix-funnel recall regressed: $rP")
  }

  test("cosineNearDupsFixed: kernel prefilter drops no pair vs unfiltered fixed-point truth") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf()).filter(col("vec_id") < 300)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine"))).toSet
    // unfiltered truth: the same fixed-point score over ALL pairs
    val side = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("xnrm", sqrt(VectorOps.dotFixed(col("v"), col("v"))))
    val a = side.alias("a"); val b = side.alias("b")
    for (thr <- Seq(0.15, 0.25, 0.4)) {
      val truth = pairs(a.join(b, col("a.id") < col("b.id"))
        .withColumn("cosine", round(
          VectorOps.dotFixed(col("a.v"), col("b.v")) /
            (col("a.xnrm") * col("b.xnrm")), 6))
        .filter(col("cosine") >= thr)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine")))
      val got = pairs(VectorOps.cosineNearDupsFixed(emb, "vec_id", "embedding", thr))
      assert(got === truth, s"prefiltered != truth at threshold $thr")
    }
  }

  test("cosineTopKLshFixed: fixed-grid replay equals the production kernel path") {
    // the oracle-replayable variant (q_vec_ann_recall) must retrieve the
    // same neighbors as the double-kernel production path — the two differ
    // only where a projection sits within float-fold ulp of zero, which
    // this fixture (and any real corpus) never exercises
    val emb = graft.Tables.embeddings(spark, sf())
    val queries = emb.filter(col("vec_id") < 10)
    val prod = topkSets(VectorOps.cosineTopKLsh(emb, queries, "vec_id",
      "embedding", 10, nPlanes = 4, tables = 4, probes = 4))
    val fixed = topkSets(VectorOps.cosineTopKLshFixed(emb, queries, "vec_id",
      "embedding", 10, nPlanes = 4, tables = 4, probes = 4))
    assert(fixed === prod)
    // and the declared recall frame agrees with a driver-side recount
    val exact = topkSets(VectorOps.cosineTopK(emb, queries, "vec_id", "embedding", 10))
    val declared = VectorOps.annRecallLsh(emb, queries, "vec_id", "embedding",
        10, nPlanes = 4, tables = 4, probes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((q, ex) <- exact)
      assert(declared(q) === (fixed.getOrElse(q, Set.empty) & ex).size.toLong,
        s"query $q recall count drifted")
  }

  test("one NN-descent round lifts the LSH k-NN graph's recall toward exact") {
    val emb = graft.Tables.embeddings(spark, sf())
    def graphSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("node"))
        .map { case (n, rows) => n -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    // exact top-5 graph on the full fixture = the ground truth
    val exact = graphSets(VectorOps.knnGraphExact(emb, "vec_id", "embedding", k = 5))
    val seedG = VectorOps.knnGraphLshFixed(emb, "vec_id", "embedding",
      k = 5, nPlanes = 3, tables = 6, maxBucket = 1000)
    val seed = graphSets(seedG)
    val refined = graphSets(VectorOps.knnGraphRefine(emb, "vec_id", "embedding",
      seedG, k = 5))
    def recall(g: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (n, ex) =>
        g.get(n).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0) }
      per.sum / per.size
    }
    val rSeed = recall(seed); val rRef = recall(refined)
    info(f"k-NN graph recall@5 — LSH seed: $rSeed%.2f, +1 NN-descent round: $rRef%.2f")
    // the candidate set includes every current neighbor, so a round can
    // only improve per-node recall; the lift floor is calibrated to THIS
    // fixture (random vectors have no manifold structure, so
    // neighbor-of-neighbor correlation is weak — measured 0.79 → 0.82;
    // real embedding corpora see far larger lifts per Dong et al.)
    assert(rRef >= rSeed, "descent round dropped recall — candidate set not a superset")
    assert(rRef >= math.min(rSeed + 0.02, 0.95),
      f"descent lift collapsed: $rSeed%.2f -> $rRef%.2f")
  }

}
