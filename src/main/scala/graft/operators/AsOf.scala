package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single latest right row with
  * `rightTs <= leftTs` within the same key (the time-series point-in-time
  * join Spark lacks as a primitive).
  *
  * Implementation is the union+window trick, NOT a band join: tag both
  * sides, union them, and carry the last-seen right-row payload forward with
  * `last(_, ignoreNulls)` over a (key, ts, side) ordering. One shuffle on
  * the key, O(n log n) sort, no candidate-pair blowup — at 100 TB this is
  * the difference between a sort and a quadratic band explosion. Right rows
  * that tie on (key, ts) are collapsed to the max-`rightId` row first so the
  * match is deterministic.
  */
object AsOf {

  /** @param rightValueCols right columns to surface (renamed as given)
    * @return left rows + matched right payload (null when no prior right) */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightId: String, rightValueCols: Map[String, String]): DataFrame = {
    // deterministic dedupe of right rows sharing (key, ts)
    val dedupW = Window.partitionBy(col(key), col(ts)).orderBy(col(rightId).desc)
    val r = right
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .select(col(key) +: col(ts).as(ts) +:
        rightValueCols.toSeq.sortBy(_._1).map { case (src, dst) =>
          col(src).as(s"__r_$dst")
        }: _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right (side 0) sorts before left (side 1) at equal ts ⇒ inclusive <=;
    // right rows at equal (key, ts) were already collapsed to one
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValueCols.toSeq.sortBy(_._1).foldLeft(unioned) {
      case (df, (_, dst)) =>
        df.withColumn(dst, last(col(s"__r_$dst"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop("__side")
      .drop(rightValueCols.toSeq.map(c => s"__r_${c._2}"): _*)
  }
}
