package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Throwaway probe: LSH recall@10 vs probe count on the sf0.01 fixture. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.Tables.NanosAsLong, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, r) => q -> r.map(_.getAs[Long]("neighbor_id")).toSet }
    val exact = sets(VectorOps.cosineTopK(emb, queries, "vec_id", "embedding", 10))
    def recall(ap: Map[Long, Set[Long]]) =
      exact.map { case (q, ex) =>
        ap.get(q).map(a => (a & ex).size.toDouble / ex.size).getOrElse(0.0)
      }.sum / exact.size
    for (p <- Seq(0, 2, 3, 4)) {
      val t0 = System.nanoTime()
      val r = recall(sets(VectorOps.cosineTopKLsh(emb, queries, "vec_id",
        "embedding", 10, nPlanes = 4, tables = 4, probes = p)))
      println(f"[lsh] probes=$p recall=$r%.3f t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
