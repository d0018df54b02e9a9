package graft

/** Suite-side enforcement of [[RowCountPins]] (see its scaladoc — the
  * pins are also exported by [[Verify]] as `expected_rows.json` so the
  * local t2 gate checks them engine-independently): a pipeline change
  * that alters the result SIZE of an un-oracled key fails the suite
  * instead of passing unobserved.
  */
class RowCountPinSpec extends SparkSpec {

  private val pinned: Map[String, Long] = RowCountPins.pinned

  test("every declared key without an oracle has a pinned row count") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unpinned = rowsOnly -- pinned.keySet
    assert(unpinned.isEmpty,
      s"rows-only keys without a pinned sf0.01 count: $unpinned — " +
        "add a pin here (or better, an oracle)")
    val stale = pinned.keySet -- rowsOnly
    assert(stale.isEmpty,
      s"pinned keys that now have an oracle (drop the pin): $stale")
  }

  pinned.toSeq.sortBy(_._1).foreach { case (key, expected) =>
    test(s"$key returns exactly $expected rows at sf0.01") {
      val n = SparkEntry.queries(key)(spark, sf("sf0.01")).count()
      assert(n === expected,
        s"$key row count drifted at sf0.01 (pinned $expected, got $n)")
    }
  }
}
