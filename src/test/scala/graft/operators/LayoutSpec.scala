package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def morton(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue16 matches the reference interleave, incl. clamping") {
    val cases = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535),
      (70000, -3), (12345, 54321))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue16($"a", $"b")).as[Long].collect().toSeq
    val want = cases.map { case (a, b) =>
      morton(math.min(math.max(a, 0), 65535), math.min(math.max(b, 0), 65535))
    }
    assert(got === want)
  }

  /** Files whose per-file [min,max] of `c` intersects [lo, hi] — exactly
    * the min-max skipping predicate lakehouse stats indexes evaluate.
    * (Spark itself skips at ROW-GROUP level inside the reader; per-FILE
    * bounding boxes are the measurable, format-agnostic proxy.) */
  private def intersectingFiles(dir: String, c: String, lo: Int, hi: Int): Long =
    spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      .filter(col("mn") <= hi && col("mx") >= lo)
      .count()

  test("one z-ordered layout serves range queries on EITHER dimension") {
    // 64k points on a 256x256 grid, 16 files per layout
    val df = spark.range(65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    val zDir = tmpDir("graft-zorder")
    val linDir = tmpDir("graft-linear")
    Layout.zorderWrite(df, "x", "y", zDir, numFiles = 16)
    // baseline: same data, same file count, single-column (x) sort
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    val zX = intersectingFiles(zDir, "x", 100, 120)
    val zY = intersectingFiles(zDir, "y", 100, 120)
    val linX = intersectingFiles(linDir, "x", 100, 120)
    val linY = intersectingFiles(linDir, "y", 100, 120)
    info(s"files intersecting a 21-value range — z-order: x=$zX y=$zY; " +
      s"x-sorted: x=$linX y=$linY (of 16)")
    // x-sort is unbeatable on x but reads EVERYTHING on y; z-order bounds
    // BOTH dimensions (4x4 tile grid ⇒ ~1 tile row/column + boundary).
    // repartitionByRange SAMPLES its partition boundaries, so exact file
    // counts wobble by ±2 across runs — the bound leaves headroom while
    // still proving both dimensions prune well below the 16-file table.
    assert(linY === 16L, "x-sorted layout cannot prune y — fixture broken?")
    assert(zX <= 11 && zY <= 11, s"z-order should bound both dims: x=$zX y=$zY")
    assert(zX + zY < linX + linY,
      s"z-order (${zX + zY}) should beat x-sort (${linX + linY}) across the mixed workload")

    // layout never changes answers
    val q = (d: String) => spark.read.parquet(d)
      .filter(col("x").between(100, 120) && col("y").between(100, 120)).count()
    assert(q(zDir) === q(linDir))
  }
}
