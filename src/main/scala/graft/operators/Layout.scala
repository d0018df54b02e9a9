package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-layout operators: Z-order (Morton) clustering for
  * multi-dimensional scan pruning.
  *
  * Parquet skips row groups/files on min-max stats, which a single-column
  * sort only makes selective for THAT column. Interleaving the bits of two
  * key columns and range-partitioning + sorting on the interleave gives
  * every file a tight bounding box in BOTH dimensions, so 2-D range
  * predicates prune files on either (or both) keys — the standard lakehouse
  * layout trick, here as a plain write-path operator. Results of any query
  * are layout-independent; only the files-read metric changes.
  */
object Layout {

  /** 2-D Morton interleave of two non-negative ints quantized to 16 bits
    * (values above 2¹⁶-1 clamp; negative inputs clamp to 0). Pure codegen'd
    * bit arithmetic — 32 unrolled mask/shift terms. */
  def zValue16(a: Column, b: Column): Column = {
    def clamp(c: Column): Column =
      least(greatest(c.cast(LongType), lit(0L)), lit(65535L))
    val (ca, cb) = (clamp(a), clamp(b))
    (0 until 16).map { i =>
      val abit = shiftleft(shiftright(ca, i).bitwiseAND(1L), 2 * i)
      val bbit = shiftleft(shiftright(cb, i).bitwiseAND(1L), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Write `df` parquet clustered by the Z-order of two key columns:
    * range-partition into `numFiles` ranges of the interleave, sort within
    * each — every output file covers a compact 2-D tile. */
  def zorderWrite(df: DataFrame, colA: String, colB: String, path: String,
                  numFiles: Int = 16): Unit =
    df.withColumn("__z", zValue16(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
