package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: is q_text_ngrams' cost the interpreted HOF gram
  * construction or the aggregate? Times three formulations. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.Tables.NanosAsLong, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f n=$n")
      }
    }
    time("split-only") {
      docs.select(explode(split(col("text"), " ")).as("g"))
        .groupBy("g").count().orderBy(col("count").desc, col("g")).limit(100).count()
    }
    time("hof-ngrams") {
      docs.select(explode(graft.operators.TextOps.ngrams(col("text"), 2)).as("g"))
        .groupBy("g").count().orderBy(col("count").desc, col("g")).limit(100).count()
    }
    time("hof-no-agg") {
      docs.select(explode(graft.operators.TextOps.ngrams(col("text"), 2)).as("g"))
        .count()
    }
    spark.stop()
  }
}
