package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation matches plain aggregation") {
    val events = graft.Tables.events(spark, sf())
    val plain = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(events, "event_type", 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted join matches plain join") {
    val fact = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")).toDF("k", "v")
    val dim = Seq((1, "one"), (2, "two")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("v", "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", 4).select("v", "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(salted === plain)
  }
}
