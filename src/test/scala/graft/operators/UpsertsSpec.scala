package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Branch-level semantics of the MERGE INTO rewrite (the LWW/patch/delete
  * shapes are covered by their oracled queries; merge has three branches
  * worth pinning on a frame small enough to eyeball). */
class UpsertsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeInto: update, delete, insert, and untouched branches") {
    val target = Seq(
      (1L, "keep", 10.0),   // not in source -> untouched
      (2L, "upd", 20.0),    // matched -> update bal from source
      (3L, "del", 30.0))    // matched + deleteCondition -> removed
      .toDF("k", "name", "bal")
    val source = Seq(
      (2L, 200.0, false),
      (3L, 300.0, true),    // doomed flag drives the delete branch
      (4L, 400.0, false))   // not in target -> insert (name NULL)
      .toDF("k", "bal", "doomed")

    val out = Upserts.mergeInto(target, source, "k",
        updateCols = Seq("bal"), deleteCondition = col("s.doomed"))
      .orderBy("k").collect()

    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    val byK = out.map(r => r.getLong(0) -> r).toMap
    assert(byK(1L).getString(1) === "keep" && byK(1L).getDouble(2) === 10.0)
    assert(byK(2L).getString(1) === "upd" && byK(2L).getDouble(2) === 200.0)
    assert(byK(4L).isNullAt(1) && byK(4L).getDouble(2) === 400.0)
  }

  test("mergeInto with no matches is insert-all ∪ target") {
    val target = Seq((1L, 1.0)).toDF("k", "v")
    val source = Seq((9L, 9.0)).toDF("k", "v")
    val out = Upserts.mergeInto(target, source, "k", updateCols = Seq("v"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 1.0), (9L, 9.0)))
  }

  test("snapshotDiff: insert/update/delete emitted, unchanged and null-equal dropped") {
    val before = Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, None: Option[String], 3.0), (4L, Some("d"), 4.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, Some("a"), 1.0),  // unchanged → dropped
      (2L, Some("B"), 2.0),                // update (string differs)
      (3L, None: Option[String], 3.0),     // null == null → dropped
      (5L, Some("e"), 5.0))                // insert; 4 deleted
      .toDF("k", "s", "v")
    val out = Upserts.snapshotDiff(before, after, "k", Seq("s", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((2L, "update"), (4L, "delete"), (5L, "insert")))
  }
}
