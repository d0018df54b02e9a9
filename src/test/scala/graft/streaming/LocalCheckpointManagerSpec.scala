package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Contract tests for [[LocalCheckpointFileManager]] — the nio manager the
  * Bench/Verify rigs select for `file:` checkpoints. Two surfaces:
  *  1. the CheckpointFileManager semantics the streaming machinery relies
  *     on (atomic visibility, cancel, first-writer-wins, recursive
  *     delete), and
  *  2. an end-to-end stop/restart of a STATEFUL query whose checkpoint is
  *     written entirely through the manager — recovery must resume from
  *     the same checkpoint, not reprocess, mirroring RestartRecoverySpec's
  *     contract under the stock manager. */
class LocalCheckpointManagerSpec extends SparkSpec {

  private def mgr(root: String) =
    new LocalCheckpointFileManager(new Path(root),
      spark.sparkContext.hadoopConfiguration)

  test("createAtomic: invisible until close, atomic content, cancel discards") {
    val root = tmpDir("graft-lcm")
    val m = mgr(root)
    val dst = new Path(root + "/sub/f1")
    val out = m.createAtomic(dst, overwriteIfPossible = false)
    out.write("hello".getBytes)
    assert(!m.exists(dst), "file must not be visible before close")
    out.close()
    assert(m.exists(dst))
    val in = m.open(dst)
    val buf = new Array[Byte](5); in.readFully(buf); in.close()
    assert(new String(buf) === "hello")
    // cancel: nothing appears, temp cleaned up
    val out2 = m.createAtomic(new Path(root + "/sub/f2"), overwriteIfPossible = false)
    out2.write("junk".getBytes)
    out2.cancel()
    assert(!m.exists(new Path(root + "/sub/f2")))
    assert(m.list(new Path(root + "/sub")).map(_.getPath.getName).toSet === Set("f1"),
      "no temp residue after cancel")
  }

  test("first-writer-wins: overwrite=false close on existing dest throws and keeps winner") {
    val root = tmpDir("graft-lcm")
    val m = mgr(root)
    val dst = new Path(root + "/f")
    val w1 = m.createAtomic(dst, overwriteIfPossible = false)
    w1.write("winner".getBytes); w1.close()
    val w2 = m.createAtomic(dst, overwriteIfPossible = false)
    w2.write("loser!".getBytes)
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { w2.close() }
    val in = m.open(dst)
    val buf = new Array[Byte](6); in.readFully(buf); in.close()
    assert(new String(buf) === "winner")
    // overwrite=true replaces
    val w3 = m.createAtomic(dst, overwriteIfPossible = true)
    w3.write("newer!".getBytes); w3.close()
    val in2 = m.open(dst)
    in2.readFully(buf); in2.close()
    assert(new String(buf) === "newer!")
  }

  test("delete is recursive and silent on missing; mkdirs nests") {
    val root = tmpDir("graft-lcm")
    val m = mgr(root)
    m.mkdirs(new Path(root + "/a/b/c"))
    val o = m.createAtomic(new Path(root + "/a/b/c/x"), overwriteIfPossible = true)
    o.write("1".getBytes); o.close()
    m.delete(new Path(root + "/a"))
    assert(!m.exists(new Path(root + "/a")))
    m.delete(new Path(root + "/a")) // missing: no throw
  }

  test("stateful stream stop/restart recovers from a checkpoint written by the manager") {
    import spark.implicits._
    val dir = tmpDir("graft-lcm-restart")
    val src = dir + "/src"
    def addFile(df: DataFrame, idx: Int): Unit = {
      val fs = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(src))
      val tmp = new Path(src + s"/_tmp$idx")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.globStatus(new Path(tmp, "part-*.parquet")).head.getPath
      val dest = new Path(src, f"b$idx%03d.parquet")
      fs.rename(part, dest); fs.delete(tmp, true)
      fs.setTimes(dest, 1700000000000L + idx * 60000L, -1)
    }
    addFile(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 0)
    addFile(Seq((1L, "a"), (3L, "c")).toDF("k", "v"), 1)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      "graft.streaming.LocalCheckpointFileManager")
    def run(): Unit =
      s2.readStream.schema(s2.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .dropDuplicates("k")
        .writeStream
        .queryName("graft-lcm-restart")
        .option("checkpointLocation", dir + "/ckpt")
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", dir + "/out")
        .start().awaitTermination()
    run() // processes both files, state holds keys 1,2,3
    // verify the checkpoint was in fact written via OUR manager: its
    // offsets/commits exist and batch 1 is the last committed
    assert(new java.io.File(dir + "/ckpt/commits/1").exists())
    addFile(Seq((3L, "c"), (4L, "d")).toDF("k", "v"), 2) // one dup, one new
    run() // restart from the same checkpoint: only batch 2, only key 4 new
    val out = s2.read.parquet(dir + "/out")
    assert(out.count() === 4, "restart must not reprocess committed batches")
    assert(out.select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }
}
