package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the end-to-end ingestion pipeline's single-node throughput:
  * events.parquet → envelopes → decode/flatten/infer/evolve/append, all
  * types. Usage: sbt "runMain graft.tools.IngestThroughput [sfDir]". */
object IngestThroughput {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ingest-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.Tables.NanosAsLong, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.Tables.events(spark, sfDir).count()
    val wh = java.nio.file.Files.createTempDirectory("graft-tp-wh").toString
    val t0 = System.nanoTime()
    val h = graft.Flagship.ingestEvents(spark, sfDir, wh)
    val written = h.registry.knownTypes.filterNot(_ == "descriptor_model")
      .map(t => h.tableLog(t).count()).sum
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"messages":$n,"written":$written,"sec":$sec%.2f,"msgs_per_sec":${n / sec}%.0f}""")
    spark.stop()
  }
}
