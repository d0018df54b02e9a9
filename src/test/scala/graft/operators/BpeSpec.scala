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
}
