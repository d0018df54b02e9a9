package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Measured recall of the approximate ANN paths against brute force on the
  * real embeddings fixture — documents the quality/cost trade instead of
  * only testing plumbing. Measured on this corpus: IVF(16,probe4) ≈ 0.92,
  * LSH(4 planes × 4 tables) ≈ 0.39; floors sit well below so regressions
  * surface without flaking. */
class AnnRecallSpec extends SparkSpec {

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }

  test("IVF and LSH recall@10 against brute force") {
    val emb = graft.Tables.embeddings(spark, sf()) // 500 × 64-dim
    val queries = emb.filter(col("vec_id") < 10)
    val exact = topkSets(VectorOps.cosineTopK(emb, queries, "vec_id", "embedding", 10))
    val ivf = topkSets(VectorOps.cosineTopKIvf(emb, queries, "vec_id", "embedding", 10,
      nCentroids = 16, nProbe = 4))
    val lsh = topkSets(VectorOps.cosineTopKLsh(emb, queries, "vec_id", "embedding", 10,
      nPlanes = 4))

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) =>
        approx.get(q).map(ap => (ap & ex).size.toDouble / ex.size).getOrElse(0.0)
      }
      per.sum / per.size
    }
    val rIvf = recall(ivf)
    val rLsh = recall(lsh)
    info(f"recall@10 — IVF(16 cells, probe 4): $rIvf%.2f, LSH(4 planes): $rLsh%.2f")
    assert(rIvf >= 0.15, s"IVF recall collapsed: $rIvf")
    assert(rLsh >= 0.15, s"LSH recall collapsed: $rLsh")
    // both approximations must at least beat random candidate selection
    // (10/500 = 0.02 expected recall for a random subset)
    assert(rIvf > 0.05 && rLsh > 0.05)
  }
}
