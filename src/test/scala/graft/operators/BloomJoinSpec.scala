package graft.operators

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi-join equals plain semi-join (false positives removed)") {
    val fact = (1L to 2000L).map(i => (i % 500, i)).toDF("k", "v")
    val dim = Seq(1L, 7L, 42L, 499L, 9999L).toDF("dk")
    val got = BloomJoin.semiJoin(fact, dim, "k", "dk", expectedItems = 100)
      .select("k", "v").as[(Long, Long)].collect().toSet
    val want = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("empty build side yields empty result, not a crash") {
    val fact = Seq((1L, "a")).toDF("k", "v")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomJoin.semiJoin(fact, dim, "k", "dk").count() === 0)
  }

  test("null probe keys never pass the exact join") {
    val fact = Seq(Some(1L), None, Some(2L)).toDF("k")
    val dim = Seq(1L).toDF("dk")
    val got = BloomJoin.semiJoin(fact, dim, "k", "dk")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("plan: might_contain filters the probe scan before the join") {
    val p = graft.SparkEntry.queries("q_bloom_semi")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"no bloom pre-filter in plan:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"exact semi-join missing:\n$p")
  }
}
