package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / CRUD query shapes over append-only storage.
  *
  * The reference delegates upserts to Cassandra's primary-key last-write-wins
  * (moisturizer/consumer.py:69-70); PUT overwrites, PATCH merges fields,
  * DELETE removes rows (tests/test_views.py:244-305). Spark-native
  * re-expression: append-only writes + a read-side LWW view via a ranking
  * window, PATCH as outer-join+coalesce, DELETE as anti-join rewrite.
  *
  * Scale notes: the LWW window shuffles once on the key — the same shuffle an
  * upsert-merging writer would need — and AQE coalesces post-shuffle
  * partitions. For repeated serving reads one would compact (rewrite the LWW
  * view back to storage, analogous to Cassandra compaction); `compact` below
  * is exactly that rewrite.
  */
object Upserts {

  /** Last-write-wins view: newest row per key wins. Ties on `ts` break by
    * descending `tieBreakers` in order (batch epoch, then within-batch
    * sequence), keeping the view deterministic. Pure window —
    * oracle-expressible as ROW_NUMBER(). */
  def lwwView(df: DataFrame, key: Seq[String], ts: String,
              tieBreakers: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(ts).desc +: tieBreakers.map(col(_).desc)
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** PATCH semantics (tests/test_views.py:283-297): fields present in
    * `patch` override, absent fields keep the base value. Full outer on the
    * key so patches to unknown ids create rows (PUT-like upsert). */
  def patchMerge(base: DataFrame, patch: DataFrame, key: String): DataFrame = {
    val commonCols = base.columns.filter(patch.columns.contains).filterNot(_ == key)
    val patchOnly = patch.columns.filterNot(base.columns.contains)
    val baseOnly = base.columns.filterNot(patch.columns.contains).filterNot(_ == key)
    val b = base.alias("b")
    val p = patch.alias("p")
    val joined = b.join(p, col(s"b.`$key`") === col(s"p.`$key`"), "full_outer")
    val cols: Seq[Column] =
      coalesce(col(s"b.`$key`"), col(s"p.`$key`")).as(key) +:
      (commonCols.map(c => coalesce(col(s"p.`$c`"), col(s"b.`$c`")).as(c)) ++
        baseOnly.map(c => col(s"b.`$c`").as(c)) ++
        patchOnly.map(c => col(s"p.`$c`").as(c))).toSeq
    joined.select(cols: _*)
  }

  /** DELETE as anti-join rewrite (tests/test_views.py:234-241,300-305):
    * survivors = base ▷ doomed. */
  def deleteAnti(base: DataFrame, doomedKeys: DataFrame, key: String): DataFrame =
    base.join(doomedKeys.select(col(s"`$key`")).distinct(), Seq(key), "left_anti")

  /** SNAPSHOT DIFF — the audit inverse of the upsert loop: given two
    * states of a keyed table (before/after an ingest epoch, a compaction,
    * a backfill), emit the CDC delta that turns one into the other:
    * `insert` (key only in after), `delete` (key only in before), and
    * `update` (any compared column differs, null-safely). Unchanged keys
    * are dropped — the delta is what replication/audit consumes. One full
    * outer join on the key (the same shuffle MERGE pays); output carries
    * each compared column twice (`<c>_before` / `<c>_after`). */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame =
    snapshotDiffKeys(before, after, Seq(key), compareCols)

  /** Multi-key [[snapshotDiff]] (e.g. a per-(user, day) state). Presence
    * on each full-outer side is detected by a sentinel marker column
    * (`lit(true)` per side), NOT by key nullness — a legitimately-null key
    * value never matches the equi-join, so both sides' rows surface
    * unmatched and classify as a delete + an insert (the only faithful
    * reading of a null-keyed row under equi-join semantics) instead of
    * being misattributed by whichever key column happened to be probed. */
  def snapshotDiffKeys(before: DataFrame, after: DataFrame, keys: Seq[String],
                       compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiffKeys: at least one key column")
    val b = before.select((keys ++ compareCols).map(c => col(s"`$c`")): _*)
      .withColumn("__b_present", lit(true)).alias("b")
    val a = after.select((keys ++ compareCols).map(c => col(s"`$c`")): _*)
      .withColumn("__a_present", lit(true)).alias("a")
    val joined = b.join(a,
      keys.map(k => col(s"b.`$k`") === col(s"a.`$k`")).reduce(_ && _),
      "full_outer")
    val differs = compareCols
      .map(c => !(col(s"b.`$c`") <=> col(s"a.`$c`"))).reduce(_ || _)
    val change = when(col("b.__b_present").isNull, "insert")
      .when(col("a.__a_present").isNull, "delete")
      .when(differs, "update")
    val cols: Seq[Column] =
      keys.map(k => coalesce(col(s"b.`$k`"), col(s"a.`$k`")).as(k)) ++
      (change.as("change") +:
        compareCols.flatMap(c => Seq(col(s"b.`$c`").as(s"${c}_before"),
          col(s"a.`$c`").as(s"${c}_after"))))
    joined.filter(change.isNotNull).select(cols: _*)
  }

  /** Delta-style MERGE INTO as one batch rewrite over a full outer join:
    *
    *   WHEN MATCHED AND deleteCondition THEN DELETE
    *   WHEN MATCHED THEN UPDATE SET (updateCols from source)
    *   WHEN NOT MATCHED THEN INSERT (source projected onto target schema;
    *                                 target-only columns become NULL)
    *
    * `deleteCondition` may reference both sides via the `t`/`s` aliases.
    * One shuffle on the key (the same shuffle a transactional MERGE
    * executes), fully expressible in ANSI SQL for the oracle. */
  def mergeInto(target: DataFrame, source: DataFrame, key: String,
                updateCols: Seq[String],
                deleteCondition: Column = lit(false)): DataFrame = {
    val t = target.alias("t")
    val s = source.alias("s")
    val joined = t.join(s, col(s"t.`$key`") === col(s"s.`$key`"), "full_outer")
    val matched = col(s"t.`$key`").isNotNull && col(s"s.`$key`").isNotNull
    val sourceOnly = col(s"t.`$key`").isNull
    val kept = joined.filter(!(matched && deleteCondition))
    val cols: Seq[Column] = target.columns.toSeq.map { c =>
      if (c == key) coalesce(col(s"t.`$key`"), col(s"s.`$key`")).as(key)
      else if (updateCols.contains(c) && source.columns.contains(c))
        when(matched || sourceOnly, col(s"s.`$c`"))
          .otherwise(col(s"t.`$c`")).as(c)
      else col(s"t.`$c`").as(c)
    }
    kept.select(cols: _*)
  }

  /** Compaction: materialize the LWW view back to storage, collapsing the
    * append log (Cassandra-compaction analog). */
  def compact(df: DataFrame, key: Seq[String], ts: String, outPath: String): Unit =
    lwwView(df, key, ts).write.mode("overwrite").parquet(outPath)
}
