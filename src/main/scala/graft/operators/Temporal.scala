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

  /** ONE INCREMENTAL FOLD of SCD2 maintenance: `prev` is an SCD2 history
    * (the [[scd2]] output shape), `batch` is a new slice of events whose
    * per-key order comes strictly AFTER everything `prev` has seen (the
    * cross-batch ordering a CDC log source provides); the result is the
    * SCD2 history over the union — `fold(fold(scd2(b0), b1), b2) ==
    * scd2(b0 ∪ b1 ∪ b2)`. Pass a zero-row `prev` (e.g.
    * `scd2(batch.limit(0), …)`) to bootstrap.
    *
    * Mechanics: the key's CURRENT attributes seed the within-batch
    * change-capture lag (so a batch head row repeating the standing state
    * is correctly dropped, null-safely); each key's open interval closes
    * at its first new change; new change rows chain validity among
    * themselves. Per batch this costs one window over the batch plus one
    * key-join against `prev` — linear in |prev| + |batch|, no global
    * sort; at 100 TB `prev` would live in a merge-capable sink keyed the
    * same way so only touched keys rewrite. */
  def scd2Fold(prev: DataFrame, batch: DataFrame, keyCols: Seq[String],
               tsCol: String, orderCols: Seq[String],
               attrCols: Seq[String]): DataFrame = {
    val keyC = keyCols.map(col)
    val w = Window.partitionBy(keyC: _*).orderBy(orderCols.map(col): _*)
    // one row per key: the standing current attributes (+ presence marker)
    val cur = prev.filter(col("is_current"))
      .select(keyC ++ (lit(true).as("_has") +:
        attrCols.map(a => col(a).as(s"_prev_$a"))): _*)
    val seeded = batch.join(cur, keyCols, "left")
    val isFirst = row_number().over(w) === 1
    val changedVsLag = attrCols
      .map(a => !(lag(col(a), 1).over(w) <=> col(a))).reduce(_ || _)
    val changedVsState = attrCols
      .map(a => !(col(s"_prev_$a") <=> col(a))).reduce(_ || _)
    // head row of a NEW key is always a change (mirrors changeCapture's
    // row_number pin); head row of a known key compares against the
    // standing state instead of the (null) within-batch lag
    val changed = when(isFirst,
      !coalesce(col("_has"), lit(false)) || changedVsState)
      .otherwise(changedVsLag)
    val helper = Seq("_has") ++ attrCols.map(a => s"_prev_$a")
    val changes = seeded.withColumn("_chg", changed)
      .filter(col("_chg")).drop("_chg" +: helper: _*)
    val newRows = changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
    // close each touched key's open interval at its first new change
    val firsts = newRows.groupBy(keyC: _*)
      .agg(min(col("valid_from")).as("_close_ts"))
    val prevUpd = prev.join(firsts, keyCols, "left")
      .withColumn("valid_to",
        when(col("is_current") && col("_close_ts").isNotNull,
          col("_close_ts")).otherwise(col("valid_to")))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_close_ts")
    prevUpd.unionByName(newRows.select(prevUpd.columns.toIndexedSeq.map(col): _*))
  }
}


