package graft

import org.apache.spark.sql.functions._

/** Recall pins for the declared indexed hybrid ([[Queries.qHybridRrf]] —
  * postings lexical top-50 + persisted-IVF vector top-50, union-RRF)
  * against two ground truths (the AnnRecallSpec doctrine applied to the
  * fused composition):
  *  1. the SAME-TRUNCATION exact fusion — identical lexical ranker and
  *     list policy, the vector side exact brute-force instead of IVF; the
  *     only divergence is the IVF candidate misses, so this isolates the
  *     approximation the index introduces;
  *  2. the DENSE brute-force fusion ([[Queries.qHybridRrfDense]] — both
  *     rankings over the full corpus, inner-pool RRF): the reference
  *     ranking a production stack can't afford to serve. Random
  *     synthetic text/embeddings are the pessimistic bound here — the
  *     two rankers are uncorrelated, so dense-RRF winners are often
  *     mid-list on both sides, exactly what truncation drops. */
class HybridRecallSpec extends SparkSpec {

  private def top10(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank")))
      .groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.sortBy(_._3).map(_._2).toSeq }

  private def meanRecall(truth: Map[Long, Seq[Long]],
                         got: Map[Long, Seq[Long]]): Double = {
    assert(got.keySet === truth.keySet, "query sets must match")
    val rs = truth.keys.toSeq.sorted.map { q =>
      (truth(q).toSet intersect got(q).toSet).size.toDouble / truth(q).size
    }
    rs.sum / rs.size
  }

  test("indexed hybrid tracks the same-truncation exact fusion (IVF miss only)") {
    val d = sf()
    val emb = Tables.embeddings(spark, d)
    val lex = Queries.lexPostingsTopN(spark, d, n = 50)
    val exactVec = operators.VectorOps.cosineTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 50)
      .select("query_id", "neighbor_id", "rank")
    val truth = top10(operators.VectorOps.rrfFuseUnion(lex, exactVec,
      rankAName = "lex_rank", rankBName = "vec_rank"))
    val got = top10(Queries.qHybridRrf(spark, d))
    val mean = meanRecall(truth, got)
    // measured 0.84 on the sf0.001 fixture; backed off to a floor — the
    // gap is exactly the IVF probe misses (6/16 cells), AnnRecallSpec's
    // regime
    assert(mean >= 0.70,
      s"indexed hybrid diverged from the same-truncation exact fusion: $mean")
  }

  test("indexed hybrid overlaps the dense ground truth (pessimistic bound)") {
    val d = sf()
    val dense = top10(Queries.qHybridRrfDense(spark, d))
    val got = top10(Queries.qHybridRrf(spark, d))
    val mean = meanRecall(dense, got)
    // measured 0.46 on the random sf0.001 fixture (uncorrelated rankers —
    // see the class doc); the pin catches the composition collapsing, not
    // a tight quality claim
    assert(mean >= 0.30,
      s"mean fused recall@10 vs dense ground truth fell to $mean")
  }
}
