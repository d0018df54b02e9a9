package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time trace for one declared key: prints every Spark job's
  * duration + call site during the LAST (warm) run, so fixed per-batch
  * costs (planning gaps between jobs, driver-side work) are attributable.
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.JobTrace q_stream_compact [warmups]"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val key = args.headOption.getOrElse("q_stream_compact")
    val warmups = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.Tables.NanosAsLong, "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.streaming.LocalCheckpointFileManager")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(key)
    (1 to warmups).foreach { _ =>
      fn(spark, sfDir).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t00 = System.nanoTime()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?") + " | " + Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.long")))
          .getOrElse("").linesIterator.toSeq
          .find(l => l.contains("graft") && !l.contains("JobTrace"))
          .getOrElse("")
        starts.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(j.jobId, (j.time, "?"))
        val rel = (System.nanoTime() - t00) / 1e9
        lines.add(f"[job] ${j.jobId}%4d +$rel%7.3fs  ${j.time - t0}%6dms  ${desc.take(110)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // per-ACTION durations including planning: funcName + top of the
    // optimized plan attributes the driver-side gaps the job trace can't
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val rel = (System.nanoTime() - t00) / 1e9
        val head = qe.optimizedPlan.toString.linesIterator
          .take(4).map(_.take(100)).mkString(" // ")
        lines.add(f"[qe ] +$rel%7.3fs  ${durationNs / 1e6}%7.1fms  $funcName%-14s sess=${qe.sparkSession.hashCode()} uuid=${org.apache.spark.sql.graftbridge.Bridge.sessionUUID(qe.sparkSession)} $head")
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qeListener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    lines.forEach(l => println(l))
    println(f"[jobtrace] $key warm run: wall $wall%.3fs rows=$n jobs=${lines.size}")
    spark.stop()
  }
}
