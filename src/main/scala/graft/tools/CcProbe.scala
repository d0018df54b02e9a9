package graft.tools

import graft.{Tables, Queries}
import graft.operators.{DedupOps, GraphOps, VectorOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the dedup-cluster queries (builder diagnostics). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosAsLong, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(100).count()

    val docs = Tables.documents(spark, d)
    val sh = time("shingle explode+hash+checkpoint") {
      docs.select(col("doc_id"),
        explode(transform(DedupOps.shingles(col("text"), 8),
          x => xxhash64(x))).as("sh")).localCheckpoint()
    }
    val pairs = time("pair generation") {
      val ok = sh.groupBy("sh").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs").between(2, 10))
      val cand = sh.join(ok.select("sh"), "sh")
      val p = cand.as("a").join(cand.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct().localCheckpoint()
      println(s"[probe] pairs=${p.count()}")
      p
    }
    val lbl = time("connectedComponents") {
      val l = GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      println(s"[probe] labeled=${l.count()}"); l
    }
    time("dedupClusters join+sizes+order") {
      GraphOps.dedupClusters(docs, "doc_id", pairs).orderBy("doc_id").count()
    }
    time("q_dedup_embedding_cluster full") {
      Queries.qDedupEmbeddingCluster(spark, d).count()
    }
    time("cosineNearDups alone") {
      VectorOps.cosineNearDups(Tables.embeddings(spark, d), "vec_id",
        "embedding", threshold = 0.38).count()
    }
    spark.stop()
  }
}
