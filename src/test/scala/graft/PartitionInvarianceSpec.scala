package graft

/** Declared-query results must not depend on the shuffle fan-out — the
  * "deterministic at any parallelism" design claim (decimal-exact sums,
  * fixed-point kernels, integer-scaled iterations, total-order ORDER BYs)
  * as one executable sweep: every query runs on two isolated sessions
  * whose `spark.sql.shuffle.partitions` differ (a prime vs the test
  * default) and must produce identical rows. Queries that pin their own
  * state sizing on internal child sessions (the streaming family) are
  * exercised end-to-end like any other — their isolation is part of the
  * claim. Runs at sf0.001. */
class PartitionInvarianceSpec extends SparkSpec {

  test("all declared queries are shuffle-partition invariant at sf0.001") {
    val dir = sf()
    // AQE partition coalescing would collapse both configs to the same
    // tiny post-shuffle fan-out at sf0.001, making the sweep vacuous —
    // disable it so 7-vs-3 shuffles genuinely differ
    val s5 = spark.newSession()
    s5.conf.set("spark.sql.shuffle.partitions", "7")
    s5.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val s4 = spark.newSession()
    s4.conf.set("spark.sql.shuffle.partitions", "3")
    s4.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val unstable = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val a = SparkEntry.queries(name)(s5, dir).collect().map(_.toString).toSeq
      val b = SparkEntry.queries(name)(s4, dir).collect().map(_.toString).toSeq
      if (a == b) None else Some(s"$name (${a.length} vs ${b.length} rows)")
    }
    assert(unstable.isEmpty,
      s"partition-dependent declared queries: ${unstable.mkString(", ")}")
  }
}
