package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / CDC operators: consecutive-change capture and SCD2 history
  * reconstruction — how a warehouse turns an append-only event stream into
  * a queryable "state over time" table (the serving-side complement of the
  * engine's LWW upsert, which keeps only the LATEST state).
  *
  * Scale notes: both operators are one window per key — state is bounded by
  * the per-key row count, the partitionBy key is the shuffle key, and no
  * global sort exists anywhere. Deterministic given a unique (orderCols)
  * ordering per key; null attribute values compare null-safely.
  */
object Temporal {

  /** Drop rows whose tracked attributes all equal the previous row's for
    * the same key (ordered by `orderCols`) — the dedupe-consecutive step of
    * a CDC pipeline. The first row per key is always kept. */
  def changeCapture(df: DataFrame, keyCols: Seq[String],
                    orderCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // row_number pins the first row per key: lag() there is NULL, which a
    // null-safe compare against a NULL attribute would wrongly call "equal"
    val changed = attrCols
      .map(a => !(lag(col(a), 1).over(w) <=> col(a)))
      .reduce(_ || _)
    df.withColumn("_changed", row_number().over(w) === 1 || changed)
      .filter(col("_changed")).drop("_changed")
  }

  /** SCD2 (slowly-changing-dimension type 2) reconstruction: one row per
    * attribute change with its validity interval. `valid_to` is NULL on the
    * open (current) interval; `is_current` marks it. */
  def scd2(df: DataFrame, keyCols: Seq[String], tsCol: String,
           orderCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val changes = changeCapture(df, keyCols, orderCols, attrCols)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
