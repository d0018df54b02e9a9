package graft.operators

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (user, seq, status)
    (1L, 1L, "new"), (1L, 2L, "new"), (1L, 3L, "active"),
    (1L, 4L, "active"), (1L, 5L, "new"),
    (2L, 1L, "active"),
    (3L, 1L, null.asInstanceOf[String]), (3L, 2L, null.asInstanceOf[String]),
    (3L, 3L, "active"))
  private def df = rows.toDF("user_id", "seq", "status")

  test("changeCapture keeps first row and drops consecutive repeats, null-safely") {
    val got = Temporal.changeCapture(df, Seq("user_id"), Seq("seq"), Seq("status"))
      .select("user_id", "seq").as[(Long, Long)].collect().toSet
    // user 1: seq 1 (first), 3 (new->active), 5 (active->new)
    // user 2: seq 1; user 3: seq 1 (null first), 3 (null->active)
    assert(got === Set((1L, 1L), (1L, 3L), (1L, 5L), (2L, 1L), (3L, 1L), (3L, 3L)))
  }

  test("scd2 builds contiguous validity intervals with one open current row") {
    val got = Temporal.scd2(df, Seq("user_id"), "seq", Seq("seq"), Seq("status"))
      .select("user_id", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toSet
    assert(got === Set(
      (1L, 1L, 3L, false), (1L, 3L, 5L, false), (1L, 5L, -1L, true),
      (2L, 1L, -1L, true),
      (3L, 1L, 3L, false), (3L, 3L, -1L, true)))
    // exactly one current interval per key
    val current = Temporal.scd2(df, Seq("user_id"), "seq", Seq("seq"), Seq("status"))
      .filter($"is_current").groupBy("user_id").count()
      .collect().map(_.getLong(1)).toSet
    assert(current === Set(1L))
  }

  test("scd2Fold over ordered slices equals one-shot scd2 (random 120-case sweep)") {
    // randomized keys/attrs with repeats and nulls, folded in 1..4
    // time-ordered slices — every fold sequence must land on batch scd2
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 20 + rnd.nextInt(40)
      val rows = (1 to n).map { seq =>
        val key = (1 + rnd.nextInt(4)).toLong
        val status = rnd.nextInt(4) match {
          case 0 => null.asInstanceOf[String]
          case s => s"s$s"
        }
        (key, seq.toLong, status)
      }
      val all = rows.toDF("user_id", "seq", "status")
      val expected = Temporal.scd2(all, Seq("user_id"), "seq", Seq("seq"),
        Seq("status")).collect().map(_.toString).sorted.toSeq
      val nSlices = 1 + rnd.nextInt(4)
      val bounds = (Seq(0, n) ++ Seq.fill(nSlices - 1)(rnd.nextInt(n + 1)))
        .sorted.distinct
      val slices = bounds.zip(bounds.tail).map { case (a, b) =>
        rows.slice(a, b).toDF("user_id", "seq", "status")
      }
      val folded = slices.foldLeft(
        Temporal.scd2(all.limit(0), Seq("user_id"), "seq", Seq("seq"),
          Seq("status"))) { (prev, slice) =>
        // localCheckpoint stands in for the state-dir write/read between
        // micro-batches (and keeps the fold-of-fold plans small)
        Temporal.scd2Fold(prev, slice, Seq("user_id"), "seq", Seq("seq"),
          Seq("status")).localCheckpoint()
      }
      val got = folded.collect().map(_.toString).sorted.toSeq
      assert(got === expected, s"trial=$trial slices=${bounds.mkString(",")}")
    }
  }
}


