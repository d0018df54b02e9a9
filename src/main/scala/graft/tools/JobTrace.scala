package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Conf-registered QueryExecutionListener with a process-global sink:
  * `spark.sql.queryExecutionListeners` instantiates one per session —
  * including `newSession()` children, which do NOT inherit
  * programmatically-registered listeners — so child-session actions
  * (streaming rigs' sized sessions and their micro-batch clones) land in
  * the same trace. */
class JobTraceQeListener extends org.apache.spark.sql.util.QueryExecutionListener {
  override def onSuccess(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution,
      durationNs: Long): Unit = JobTrace.record(funcName, qe, durationNs)
  override def onFailure(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution,
      exception: Exception): Unit = ()
}

/** Per-JOB and per-ACTION wall-time trace for one declared key: prints
  * every Spark job duration (call site) and every QueryExecutionListener
  * action (duration INCLUDING planning, session attribution) during the
  * LAST (warm) run — fixed per-batch costs and driver-side gaps between
  * jobs become attributable. Listeners register BEFORE the warmups so
  * child sessions created on the first run (streaming rigs cache sized
  * children) inherit them; recording is gated to the final run.
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.JobTrace q_stream_compact [warmups]"
  */
object JobTrace {
  private val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile private var t00 = System.nanoTime()
  private val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private[tools] def record(funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution,
      durationNs: Long): Unit = if (recording.get()) {
    val rel = (System.nanoTime() - t00) / 1e9
    val head = qe.optimizedPlan.toString.linesIterator
      .take(4).map(_.take(100)).mkString(" // ")
    lines.add(f"[qe ] +$rel%7.3fs  ${durationNs / 1e6}%7.1fms  $funcName%-14s sess=${qe.sparkSession.hashCode()} $head")
    // the POST-execution plan shows AQE's final choices (join strategy
    // rewrites, AQEShuffleRead coalescing) that pre-run explain cannot
    if (sys.env.get("SPARK_GRAFT_TRACE_PLAN").contains("1"))
      lines.add(qe.executedPlan.toString)
  }

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
      .config("spark.sql.queryExecutionListeners",
        "graft.tools.JobTraceQeListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(key)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
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
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (recording.get()) {
        val (t0, desc) = starts.getOrDefault(j.jobId, (j.time, "?"))
        val rel = (System.nanoTime() - t00) / 1e9
        lines.add(f"[job] ${j.jobId}%4d +$rel%7.3fs  ${j.time - t0}%6dms  ${desc.take(110)}")
      }
      // per-STAGE task counts + aggregate task time: a 2 s job can be one
      // coalesced straggler task or 32 balanced ones — the job line alone
      // cannot tell them apart (the AQE-coalescing blind spot)
      override def onStageCompleted(
          st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (recording.get()) {
          val i = st.stageInfo
          val rel = (System.nanoTime() - t00) / 1e9
          val wall = (for { a <- i.completionTime; b <- i.submissionTime }
            yield a - b).getOrElse(-1L)
          lines.add(f"[stg] ${i.stageId}%4d +$rel%7.3fs  $wall%6dms  tasks=${i.numTasks}%3d  exec=${i.taskMetrics.executorRunTime}ms  ${i.name.take(80)}")
        }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to warmups).foreach { _ =>
      fn(spark, sfDir).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    t00 = System.nanoTime()
    recording.set(true)
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t00) / 1e9
    Thread.sleep(500) // let the listener bus drain
    lines.forEach(l => println(l))
    println(f"[jobtrace] $key warm run: wall $wall%.3fs rows=$n events=${lines.size}")
    spark.stop()
  }
}
