package graft.operators

import graft.SparkSpec

/** BM25 is rows-only under the oracle gate (ln drift), so this spec IS its
  * correctness gate: a driver-side twin computes the exact Okapi formula
  * on a small fixture and the distributed result must match to the same
  * 6-decimal rounding. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "join join join hash"),        // short, join-heavy
    (2L, "join hash scan filter sort"), // all three terms once
    (3L, "scan scan scan scan scan scan scan scan"), // long, scan-only
    (4L, "filter sort window"),         // no query terms
    (5L, "hash"),                       // shortest, one term
    (6L, "12345 !!!")                   // ZERO tokens — still counts in N
  ).toDF("doc_id", "text")

  private val terms = Seq("join", "hash", "scan")
  private val (k1, b) = (1.2, 0.75)

  /** Driver twin: exact BM25 over the same tokenization (lowercase letter
    * runs), same idf, same rounding. */
  private def twin(): Seq[(Long, Double)] = {
    val tok = docs.collect().map(r => r.getLong(0) ->
      "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq).toMap
    val n = tok.size
    val avg = tok.values.map(_.size).sum.toDouble / n
    def dfOf(t: String) = tok.values.count(_.contains(t))
    val idf = terms.map(t => t -> math.log(
      1.0 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5))).toMap
    tok.toSeq.flatMap { case (id, words) =>
      val score = terms.map { t =>
        val c = words.count(_ == t).toDouble
        if (c == 0) 0.0
        else idf(t) * c * (k1 + 1) /
          (c + k1 * (1 - b + b * words.size / avg))
      }.sum
      if (score == 0.0) None
      else Some(id -> BigDecimal(score)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }
  }

  test("distributed BM25 equals the exact driver twin, same rounding") {
    val got = TextOps.bm25Search(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got === twin())
  }

  test("ranking invariants: tf saturation and length normalization") {
    val got = TextOps.bm25Search(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Double)].collect().toMap
    // doc 4 has no query terms, doc 6 no tokens at all — absent from
    // results (but both counted in N by the twin, pinning Robertson's N)
    assert(!got.contains(4L) && !got.contains(6L))
    // doc 2 (all three terms) must outrank doc 5 (one term, same-ish len)
    assert(got(2L) > got(5L))
    // doc 1 (3×join + hash) outranks doc 3 (8×scan): idf-weighted
    // multi-term beats saturated single-term repetition
    assert(got(1L) > got(3L))
  }

  test("k truncates and empty query-term postings yield an empty result") {
    assert(TextOps.bm25Search(docs, "doc_id", "text", terms, k = 2)
      .count() === 2)
    assert(TextOps.bm25Search(docs, "doc_id", "text", Seq("zzz"), k = 5)
      .count() === 0)
  }
}
