package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("ngrams: sliding non-distinct grams; short doc yields one gram") {
    val df = Seq("a b a b", "xy").toDF("text")
      .select(TextOps.ngrams(col("text"), 2).as("g"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got === Seq(Seq("a b", "b a", "a b"), Seq("xy")))
  }

  test("invertedIndex: df counts all docs, postings truncate at cap") {
    val docs = (1L to 30L).map(i => (i, if (i <= 25) "hot word" else "cold item"))
      .toDF("doc_id", "text")
    val got = TextOps.invertedIndex(docs, "doc_id", "text", cap = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(got("hot") === (25L, (1L to 10L)))       // df = 25, postings capped
    assert(got("cold") === (5L, (26L to 30L)))
    assert(got("word")._1 === 25L)
  }

  test("chunkTokens: stride/window boundaries and sub-window docs") {
    val docs = Seq(
      (1L, (1 to 64).map(i => s"t$i").mkString(" ")), // exactly one window + tail
      (2L, "a b c"),                                  // sub-stride doc
      (3L, "")).toDF("doc_id", "text")                // empty text = [""] token
    val got = TextOps.chunkTokens(docs, "doc_id", "text", winSize = 64, stride = 48)
      .select("doc_id", "chunk_idx", "start_tok", "chunk_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 16L),
      (2L, 0L, 0L, 3L),
      (3L, 0L, 0L, 1L)))
  }

  test("contaminationPairs: shared counts, containment, no-overlap pairs absent") {
    // eval 10: grams {a b, b c} (2 distinct); eval 20: {p q} (short doc)
    val evalSet = Seq((10L, "a b c"), (20L, "p q")).toDF("doc_id", "text")
    // train 1 shares both of eval 10's grams (and nothing of 20's);
    // train 2 shares one; train 3 shares none → absent from the output
    val train = Seq(
      (1L, "a b c x"),   // grams {a b, b c, c x}
      (2L, "z a b"),     // grams {z a, a b}
      (3L, "q p")        // gram {q p} ≠ {p q}
    ).toDF("doc_id", "text")
    val got = TextOps.contaminationPairs(train, evalSet, "doc_id", "text", k = 2)
      .orderBy("eval_id", "train_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (10L, 1L, 2L, 2L, 1.0),   // full containment: the verbatim-leak case
      (10L, 2L, 1L, 2L, 0.5)))
  }

  test("redactPii masks emails and long digit runs, leaves short numbers") {
    val got = Seq("mail bob@x-corp.example.com id 12345678 zip 12345")
      .toDF("t").select(TextOps.redactPii(col("t"))).as[String].head()
    assert(got === "mail <EMAIL> id <NUM> zip 12345")
  }
}
