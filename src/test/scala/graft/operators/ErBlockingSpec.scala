package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Quantifies the FuzzyMatch blocking contract on planted typos (VERDICT
  * r9 task #6): equality blocking only generates a candidate pair when at
  * least one blocking key survives the typo, so recall is a measurable
  * function of where typos can land — not an article of faith.
  *
  * The probe plants a single-character DELETION at EVERY position of
  * every distinct part name (the exhaustive single-typo universe, no
  * sampling) and asks: does the dirty name still share a blocking key
  * with its clean source? Expectations are computed from the same
  * universe, so the asserts are sharp equalities, not loose floors.
  */
class ErBlockingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val names: Seq[String] =
    Tables.part(spark, sf()).select("p_name").distinct()
      .as[String].collect().toSeq.sorted

  /** All (clean, dirty, deletedChar) single-deletion variants. */
  private def variants: Seq[(String, String, Char)] =
    for (n <- names; i <- n.indices)
      yield (n, n.substring(0, i) + n.substring(i + 1), n(i))

  private def word(s: String, i: Int): Option[String] = {
    val ws = s.split(" ", -1)
    if (i <= ws.length && ws(i - 1).nonEmpty) Some(ws(i - 1)) else None
  }

  private def keysSurvive(clean: String, dirty: String, keys: Seq[Int]): Boolean =
    keys.exists(i => word(clean, i).isDefined && word(clean, i) == word(dirty, i))

  test("measured blocking recall: noun-only is poor, word-union misses exactly the separators") {
    val vs = variants
    assert(vs.nonEmpty && names.size >= 32)

    val nounRecall =
      vs.count { case (c, d, _) => keysSurvive(c, d, Seq(2)) }.toDouble / vs.size
    val unionRecall =
      vs.count { case (c, d, _) => keysSurvive(c, d, Seq(1, 2)) }.toDouble / vs.size

    // single-key recall equals the fraction of typo positions OUTSIDE the
    // blocked word — the FuzzyMatch scaladoc's claim
    assert(nounRecall < 0.6, s"noun-only blocking recall $nounRecall should be poor")

    // union blocking misses EXACTLY the separator deletions: a deletion
    // inside a word leaves the other word's key intact; deleting the
    // space merges both words and corrupts both keys
    val spaceDeletions = vs.count(_._3 == ' ')
    val unionMisses = vs.count { case (c, d, _) => !keysSurvive(c, d, Seq(1, 2)) }
    assert(unionMisses === spaceDeletions,
      "union-block misses must be exactly the separator deletions")
    assert(unionRecall > nounRecall)
    assert(unionRecall >= 0.85, s"union recall $unionRecall")
    info(f"single-key (noun) recall: $nounRecall%.3f over ${vs.size} planted deletions")
    info(f"word-union recall:        $unionRecall%.3f (misses = $spaceDeletions separator deletions)")
  }

  test("blockedPairs equals the unblocked truth restricted to surviving keys") {
    // ground truth on the vocabulary: all pairs with lev <= 3 that share
    // at least one word — computed driver-side with a plain lev twin
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val parts = Tables.part(spark, sf())
    val nameIds = parts.groupBy("p_name").agg(min("p_partkey").as("nid"))
      .withColumn("blk1", FuzzyMatch.wordKey(col("p_name"), 1))
      .withColumn("blk2", FuzzyMatch.wordKey(col("p_name"), 2))
    val got = FuzzyMatch.blockedPairs(nameIds, "nid", "p_name",
        Seq("blk1", "blk2"), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val idOf = nameIds.select("p_name", "nid").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = (for {
      a <- names; b <- names
      if idOf(a) < idOf(b)
      if a.split(" ")(0) == b.split(" ")(0) || a.split(" ")(1) == b.split(" ")(1)
      if lev(a, b) <= 3
    } yield (idOf(a), idOf(b))).toSet
    assert(got === truth)
    assert(truth.nonEmpty, "fixture must actually produce fuzzy matches")
  }
}
