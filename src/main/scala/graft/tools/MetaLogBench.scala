package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** Diagnostic: attribute streaming checkpoint-write cost per manager.
  *
  * Found (r12, this container — no libhadoop native lib, so Hadoop local
  * permission ops fall back to shell forks):
  *   HDFSMetadataLog.add via FileContext manager   ~39 ms
  *   FileContext create+rename alone               ~37 ms  (the forks)
  *   FileSystemBasedCheckpointFileManager          ~9 ms
  *   FileSystem manager over RawLocalFileSystem    ~4.7 ms
  *   graft.streaming.LocalCheckpointFileManager    ~0.14 ms (java.nio)
  *   HDFSMetadataLog.add via the nio manager       ~0.28 ms
  * Every micro-batch pays 3+ metadata writes (source log, offset WAL,
  * commit log) plus a state delta per partition — the difference is the
  * declared streaming family's dominant fixed cost. */
object MetaLogBench {
  def t[A](name: String, n: Int)(body: Int => A): Unit = {
    body(-1); body(-2) // warmup
    val t0 = System.nanoTime()
    for (i <- 0 until n) body(i)
    println(f"[metalog] $name%-36s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/tmp/metalog-bench-" + System.nanoTime()
    val conf = spark.sessionState.newHadoopConf()

    val log = new org.apache.spark.sql.execution.streaming.HDFSMetadataLog[String](
      spark, base + "/log")
    t("HDFSMetadataLog.add (default mgr)", 30)(i => log.add(i + 10, "x" * 200))

    val mgr = org.apache.spark.sql.execution.streaming.checkpointing
      .CheckpointFileManager.create(new Path(base + "/mgr"), conf)
    mgr.mkdirs(new Path(base + "/mgr"))
    t("default mgr createAtomic+close", 30) { i =>
      val out = mgr.createAtomic(new Path(base + s"/mgr/f$i"),
        overwriteIfPossible = true)
      out.write(("x" * 200).getBytes); out.close()
    }
    println("[metalog] default manager: " + mgr.getClass.getName)

    val nio = new graft.streaming.LocalCheckpointFileManager(
      new Path(base + "/nio"), conf)
    nio.mkdirs(new Path(base + "/nio"))
    t("nio mgr createAtomic+close", 30) { i =>
      val out = nio.createAtomic(new Path(base + s"/nio/f$i"),
        overwriteIfPossible = true)
      out.write(("x" * 200).getBytes); out.close()
    }

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      "graft.streaming.LocalCheckpointFileManager")
    val log2 = new org.apache.spark.sql.execution.streaming.HDFSMetadataLog[String](
      s2, base + "/log2")
    t("HDFSMetadataLog.add (nio mgr)", 30)(i => log2.add(i + 10, "x" * 200))
    spark.stop()
  }
}
