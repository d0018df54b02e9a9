package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_lm_perplexity is rows-only (ln/summation-order ulp drift is not
  * oracle-safe), so the formula itself is pinned here: an exact driver
  * twin on a hand fixture, the LM-fit ordering property the gate exists
  * for, and the zero-word edge. */
class LmPerplexitySpec extends SparkSpec {
  import spark.implicits._

  test("cross-entropy matches the exact driver twin on a hand fixture") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the"),
      (3L, "cat mat zzz")
    ).toDF("doc_id", "text")
    val got = TextOps.unigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // driver twin: identical add-one unigram model over the same words
    val words = Seq(
      1L -> Seq("the", "cat", "sat", "on", "the", "mat"),
      2L -> Seq("the", "the", "the"),
      3L -> Seq("cat", "mat", "zzz"))
    val cw = words.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val denom = (cw.values.sum + cw.size).toDouble // N + V
    for (((id, ws), i) <- words.zipWithIndex) {
      val h = ws.map(w => math.log(denom / (cw(w) + 1).toDouble)).sum / ws.size
      val expected = math.round(h * 1e6)
      assert(got(i)._1 === id)
      assert(got(i)._2 === ws.size.toLong, s"doc $id n_words")
      // ±1 micro-nat: Spark's partition-order summation may differ from
      // the twin's sequential fold by an ulp at a rounding boundary
      assert(math.abs(got(i)._3 - expected) <= 1L, s"doc $id xent")
    }
  }

  test("LM-fit ordering: common-word docs score below rare-word docs") {
    // 50 docs of corpus-typical words + 1 gibberish doc: the gate signal
    val docs = ((1 to 50).map(i => (i.toLong, "the quick brown fox jumps")) :+
      (99L, "xqzt vprw klmn zzyx qqqv")).toDF("doc_id", "text")
    val got = TextOps.unigramPerplexity(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(got(1L) < got(99L),
      s"common ${got(1L)} must sit below gibberish ${got(99L)}")
  }

  test("zero-word docs keep a (0, 0) row") {
    val docs = Seq((1L, "some words"), (2L, "12345 !!!")).toDF("doc_id", "text")
    val got = TextOps.unigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got(1) === ((2L, 0L, 0L)))
    assert(got(0)._2 === 2L)
  }

  test("an all-empty corpus yields all-zero rows, not a crash") {
    // degenerate case: NO document has an extractable word — the unigram
    // total comes back NULL and must not NPE
    val docs = Seq((1L, "12345"), (2L, "!!!")).toDF("doc_id", "text")
    val got = TextOps.unigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 0L, 0L), (2L, 0L, 0L)))
  }
}
