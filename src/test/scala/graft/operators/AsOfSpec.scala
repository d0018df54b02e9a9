package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join matches latest prior-or-equal right row per key") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05")),
      (2L, 10L, ts("2024-01-01 10:00:00")), // exactly at quote time: inclusive
      (3L, 10L, ts("2024-01-01 09:59:00")), // before any quote
      (4L, 20L, ts("2024-01-01 10:00:10"))
    ).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (101L, 10L, ts("2024-01-01 10:00:03"), 2.0),
      (102L, 10L, ts("2024-01-01 10:00:03"), 3.0), // tie: max event_id wins
      (103L, 20L, ts("2024-01-01 10:00:01"), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")

    val out = AsOf.join(trades, quotes, "user_id", "ts", "event_id",
        Map("event_id" -> "q_id", "value" -> "q_value"))
      .orderBy("event_id")
      .select("event_id", "q_id", "q_value")
      .collect()

    assert(out(0).getLong(1) === 102L && out(0).getDouble(2) === 3.0) // latest ≤10:00:05, tie→102
    assert(out(1).getLong(1) === 100L && out(1).getDouble(2) === 1.0) // inclusive match
    assert(out(2).isNullAt(1))                                       // no prior quote
    assert(out(3).getLong(1) === 103L && out(3).getDouble(2) === 9.0) // other key
  }
}
