package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, word counts, quality scoring, token counting,
  * fingerprinting, n-gram language ID. All built from codegen'd
  * `functions._` — no UDFs in any hot path.
  *
  * Scale notes: everything here is embarrassingly parallel per document
  * except the word-count aggregation (one hash-agg shuffle on the token,
  * partial map-side combine free) — the shapes that survive a 100 TB corpus.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token split: letter runs, digit runs, and individual
    * punctuation (the standard pre-tokenizer shape used before byte-pair
    * merges). Lookaround-free regex so Java regex and RE2 agree. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  /** Corpus word count: explode + hash aggregate. */
  def wordCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Per-document quality metrics (length / word stats / stopword ratio) —
    * exact, deterministic, SQL-expressible. */
  def qualityMetrics(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val stop = Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")
    val toks = tokens(col(textCol))
    docs
      .withColumn("n_words", size(toks).cast(LongType))
      .withColumn("n_distinct_words", size(array_distinct(toks)).cast(LongType))
      .withColumn("avg_word_len",
        col("n_chars").cast(DoubleType) / col("n_words"))
      .withColumn("stopword_ratio",
        size(filter(toks, t => t.isin(stop.map(lit(_)): _*))).cast(DoubleType)
          / col("n_words"))
      .withColumn("dedup_ratio",
        col("n_distinct_words").cast(DoubleType) / col("n_words"))
  }

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_ws_tokens", size(split(col(textCol), "\\s+")).cast(LongType))
      .withColumn("n_bpeish_tokens", size(bpeishTokens(col(textCol))).cast(LongType))

  /** Order-insensitive content fingerprint: md5 of the sorted distinct token
    * set. Bag-normalized docs (shuffled word order) collide — the classic
    * cheap near-dup fingerprint. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** N-gram language ID heuristic: score each candidate language by marker
    * token hits and pick the argmax (deterministic tie-break on language
    * code). Marker lists are tiny and broadcast as literals. With no hits
    * the prediction is the lexicographically-first candidate — a heuristic,
    * like every n-gram langid. */
  def langIdPredict(text: Column, markers: Map[String, Seq[String]]): Column = {
    val toks = array_distinct(tokens(text))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(
        size(array_intersect(toks, array(ms.map(lit(_)): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, lang) — array_max on structs compares field-wise;
    // negative-lang trick not needed because ties break on the LAST field
    // ascending; we want deterministic: max score, then min lang ⇒ compare
    // (score, reversed-lang) — instead sort desc by score then asc lang.
    val best = array_sort(array(scored: _*),
      (a, b) => when(a.getField("score") > b.getField("score"), -1)
        .when(a.getField("score") < b.getField("score"), 1)
        .otherwise(when(a.getField("lang") < b.getField("lang"), -1)
          .when(a.getField("lang") > b.getField("lang"), 1).otherwise(0)))
    element_at(best, 1).getField("lang")
  }

  /** Default marker sets for the synthetic corpus's language codes. */
  val defaultMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "des"),
    "zh" -> Seq("的", "是", "了", "在", "我"))
}
