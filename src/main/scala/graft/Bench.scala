package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Tables.NanosAsLong, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup outside the timed loop: one trivial job + parquet
    // footer reads so the first measured query doesn't absorb session init
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings",
      "part", "supplier", "nation", "region").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").schema catch { case _: Throwable => }
    }
    // 3 runs per query, report the MEDIAN: single runs swing ±5s+ from JVM/
    // codegen/GC noise (BENCH_r02's 14× phantom regression on unchanged
    // code); sorted key order keeps rounds comparable query-by-query.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val filter = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILTER", "")
    val results: Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(_._1.contains(filter)).map { case (name, fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          val t = (System.nanoTime() - t0) / 1e9
          // queries that localCheckpoint (minhash/simhash/embedding dedup)
          // leave lineage-truncated blocks pinned in block-manager storage;
          // released AFTER EVERY RUN so run 1's blocks don't pressure the
          // runs being medianed (and runs×queries never accumulate)
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          t
        }.sorted
        name -> times(times.size / 2)
      }
    // ONE JSON line, but field order matters: the harness keeps only the
    // TAIL of the run's output, so with 100+ queries the line's head gets
    // truncated. Put the big per-query map FIRST and the headline
    // metric/value/total LAST so they always survive truncation; 3-decimal
    // timings keep the whole line as small as possible.
    def ms3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms3(v) }
      .mkString("{", ",", "}")
    // headline = sum of the ROUNDED per-query values, so the printed total
    // always equals the sum of the printed entries exactly (ADVICE r5)
    val total = results.map(r => ms3(r._2).toDouble).sum
    val line = s"""{"queries":$qs,"sf":"$sfDir","n_queries":${results.size},"metric":"total","value":${ms3(total)},"unit":"sec"}"""
    println(line)
    // companion file with the FULL per-query map: the harness keeps only
    // the tail of stdout, so with 130+ queries the printed map's head is
    // truncated — the file lets every key be diffed round-over-round.
    // Filtered runs skip the write: a partial map would silently replace
    // the full artifact the diff depends on.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_full.json")
    if (filter.isEmpty)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), line + "\n")
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $fullPath: ${e.getMessage}") }
    spark.stop()
  }
}
