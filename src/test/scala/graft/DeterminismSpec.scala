package graft

/** Every declared query run TWICE must produce byte-identical rows — the
  * oracle gate catches nondeterminism only when a run happens to land on
  * a different plan/ordering during the judged run; this sweep forces the
  * comparison every build. Catches: under-specified ORDER BY columns,
  * accidental RNG/partitioning dependence, unstable collect_list
  * orderings, stream scratch-dir leakage between runs. Runs at sf0.001
  * so the double sweep stays cheap. */
class DeterminismSpec extends SparkSpec {

  test("all declared queries are run-to-run deterministic at sf0.001") {
    val dir = sf()
    val unstable = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      def run(): Seq[String] =
        SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      val a = run()
      val b = run()
      if (a == b) None else Some(s"$name (${a.length} vs ${b.length} rows)")
    }
    assert(unstable.isEmpty,
      s"non-deterministic declared queries: ${unstable.mkString(", ")}")
  }
}
