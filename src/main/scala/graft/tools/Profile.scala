package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-run wall-time profile for declared queries — unlike Bench (which
  * prints only the median), prints EVERY run so warm-up/codegen cost and
  * run-to-run variance are visible. Usage:
  *   SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.Profile q_text_ngrams …"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.Tables.NanosAsLong, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { k =>
      val fn = graft.SparkEntry.queries(k)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        t
      }
      println(f"[profile] $k%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
