package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Unicode text normalization (VERDICT r18 #5) — the standard
    * CCNet/Gopher preprocessing stage ahead of dedup/quality: NFC
    * canonical composition ([[graft.plans.TextExpressions.nfc]], a native
    * codegen'd kernel), casefold (`lower`), whitespace collapse to single
    * spaces, trim. Pure per-row projection — runs in the scan stage at any
    * corpus size. Cross-engine exact: JDK Normalizer and DuckDB's
    * `nfc_normalize` both implement UAX #15; the collapse class is the
    * explicit `[ \t\n\r]+` so Java regex and RE2 read the same set. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(graft.plans.TextExpressions.nfc(text)),
      "[ \\t\\n\\r]+", " "))

  /** Planted normalization twins (ONE definition with the oracle
    * literals): the composed-UPPERCASE and decomposed-lowercase spellings
    * of the same phrase plus whitespace noise — [[normalizeText]] maps
    * BOTH to exactly "café déjà", so the normalization provably fires
    * (the q_text_pii_scrub plant precedent). */
  val PlantComposed: String = " CAF\u00C9\t D\u00C9J\u00C0 "
  val PlantDecomposed: String = " cafe\u0301  de\u0301ja\u0300\n"

  /** BPE-ish token split: letter runs, digit runs, and individual
    * punctuation (the standard pre-tokenizer shape used before byte-pair
    * merges). Lookaround-free regex so Java regex and RE2 agree. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeishPattern), lit(0))

  /** PII detection + redaction — the scrub pass every training-data
    * pipeline runs before release. Covers the regex-detectable classes
    * (emails, international-format phone numbers, IPv4 addresses);
    * NER-based classes ride the same per-partition shape with a model at
    * the codec slot. Counts are detected on the ORIGINAL text; redaction
    * replaces each class with a typed tag, emails first so a later
    * pattern can never half-match inside an already-redacted span. Pure
    * codegen'd regexp_extract_all/regexp_replace — partition-local, no
    * shuffle, linear in corpus bytes at any scale — and the patterns use
    * only constructs Java regex and RE2 share (no lookaround, no
    * backrefs), so the DuckDB oracle replays the identical function. */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def n(pat: String) =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast(LongType)
    docs
      .withColumn("n_emails", n(EmailPattern))
      .withColumn("n_phones", n(PhonePattern))
      .withColumn("n_ips", n(Ipv4Pattern))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
            Ipv4Pattern, "<IP>"),
          PhonePattern, "<PHONE>"))
  }

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

  /** All word k-grams of a text, in order, NON-distinct — the counting
    * variant of [[DedupOps.shingles]] (which wraps this in array_distinct
    * for set semantics). A doc shorter than k yields its whole token run
    * as the single gram. One pass through the native
    * [[graft.plans.WordNgrams]] kernel — the HOF chain it replaces
    * (transform+sequence+slice+array_join, all interpreted) cost ~5 µs per
    * gram and dominated every n-gram query. */
  def ngrams(text: Column, k: Int): Column =
    graft.plans.TextExpressions.wordNgrams(text, k)

  /** Corpus-wide top n-grams by frequency: one explode + one map-side-
    * combined hash aggregate; ties broken on the gram itself. */
  def topNgrams(docs: DataFrame, textCol: String, k: Int,
                limit: Int): DataFrame =
    docs.select(explode(ngrams(col(textCol), k)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram")).limit(limit)

  /** Distinct-token POSTINGS rows (doc_id, tok) — the lexical ranker's
    * standing index ([[postingsOverlapTopN]] serves from it). Pure
    * per-document projection: derived row-by-row, so per-batch postings
    * union to exactly the one-shot batch postings for every batching —
    * what lets the streaming maintenance twin (q_stream_hybrid) share the
    * batch key's oracle. */
  def docPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        array_distinct(array_remove(split(col(textCol), " "), "")).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))

  /** Token-hash bucket for the PERSISTED postings index — ONE definition
    * shared by the write side (`partitionBy("bucket")` at staging) and the
    * probe side (query tokens → literal bucket filter), so the two can
    * never disagree on a token's shard. Pruning is SOUND by construction:
    * every posting that can match a query token lives in that token's
    * bucket, so dropping all other buckets drops only rows the postings
    * equi-join would discard anyway. `buckets` scales with vocabulary —
    * at 100 TB you shard a billion-term vocabulary over thousands of
    * buckets and a few-word query still reads a handful of files. */
  def postingsBucket(tok: Column, buckets: Int): Column =
    pmod(xxhash64(tok), lit(buckets.toLong))

  /** Serve stage of the lexical postings ranker: corpus postings equi-join
    * the BROADCAST query postings (query_id, tok), overlap = COUNT per
    * (query, doc) pair (tokens are distinct per doc, so the count IS
    * |intersection|), top-`n` per query by (overlap DESC, id). The
    * sparse-retrieval shape: cost ∝ postings matched, never
    * queries × corpus; the aggregation map-side combines on the way up. */
  def postingsOverlapTopN(postings: DataFrame, queryPostings: DataFrame,
                          n: Int): DataFrame = {
    val wl = Window.partitionBy("query_id")
      .orderBy(col("overlap").desc, col("neighbor_id").asc)
    postings.join(broadcast(queryPostings), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id").as("neighbor_id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("rank", row_number().over(wl))
      .filter(col("rank") <= n)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Inverted index: term → document frequency + the first `cap` postings
    * (sorted doc ids). The posting list is truncated BEFORE collection
    * (row_number over the term partition), so no executor ever buffers an
    * unbounded hot-term list — the shape that survives a 100 TB corpus,
    * where full postings would be sharded by (term, doc_bucket) instead.
    * Both windows share one shuffle on `term`. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    cap: Int = 100): DataFrame = {
    val byTerm = Window.partitionBy("term")
    val byTermDoc = byTerm.orderBy("doc")
    docs.select(col(idCol).as("doc"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .withColumn("df_docs", count(lit(1)).over(byTerm))
      .withColumn("rn", row_number().over(byTermDoc))
      .filter(col("rn") <= cap)
      .groupBy("term")
      .agg(max(col("df_docs")).as("df_docs"),
        sort_array(collect_list(col("doc"))).as("postings"))
  }

  /** Overlapping token-window chunks (window `winSize`, stride `stride`) —
    * the context-window splitting step before tokenizer/packing in an LLM
    * training pipeline. Pure expressions: sequence + slice, one output row
    * per chunk; the chunk body travels as an md5 so downstream exchange
    * stays narrow. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  winSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && winSize >= stride,
      s"need 0 < stride <= winSize, got winSize=$winSize stride=$stride")
    val chunk = slice(col("w"), col("start_tok") + 1, lit(winSize))
    docs.select(col(idCol), tokens(col(textCol)).as("w"))
      .select(col(idCol),
        explode(sequence(lit(0), greatest(size(col("w")) - 1, lit(0)),
          lit(stride))).as("start_tok"),
        col("w"))
      .select(col(idCol),
        (col("start_tok") / stride).cast(LongType).as("chunk_idx"),
        col("start_tok").cast(LongType).as("start_tok"),
        size(chunk).cast(LongType).as("chunk_len"),
        md5(array_join(chunk, " ")).as("chunk_md5"))
  }

  /** PII masking patterns — lookaround-free so Java regex and RE2 agree. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumPattern = "[0-9]{7,}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails and ≥7-digit runs (ids, phones, accounts) — the masking
    * pass a corpus takes before training. Replace-all in one codegen'd
    * expression chain. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, lit(EmailPattern), lit("<EMAIL>")),
      lit(LongNumPattern), lit("<NUM>"))

  /** Greedy left-to-right merge of adjacent symbol pair (a, b) in a symbol
    * array — one BPE merge application as a pure `aggregate` fold (no UDF):
    * a just-merged symbol is never reused as the left side of the same
    * merge in the same position (standard BPE semantics). */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** BPE merge-table training — the tokenizer-induction job of an LLM
    * pipeline. The corpus-scale work happens ONCE in the distributed word
    * count; the (word, count) table is vocabulary-scale and collects to
    * the driver, where the inherently-sequential merge rounds run in
    * memory — the architecture every production BPE trainer uses (a
    * 100 TB corpus grows the word count's INPUT, not the vocabulary, and
    * per-round Spark jobs over a vocab-sized table buy only scheduler
    * overhead). Each round: count adjacent symbol pairs weighted by word
    * frequency, pick the argmax with a deterministic (count desc, pair
    * asc) tie-break, and apply the merge greedily left-to-right (same
    * semantics as [[mergePair]]). Iterative + stateful ⇒ genuinely not
    * ANSI-expressible (rows-only in the declared set); determinism is
    * spec-tested against hand-computed merges.
    *
    * Words = lowercase letter runs; `</w>` marks word end so merges can't
    * cross words and final symbols distinguish suffixes from prefixes.
    * Symbols stay ASCII, so the driver's string order equals the UTF8
    * binary order the previous all-Spark formulation sorted by.
    *
    * THE 100 TB CONTRACT is `minFreq`: a web corpus has 10⁸–10⁹ distinct
    * letter-run "words" (typos, hashes, agglutinations) whose collected
    * (word, count) table would OOM the driver — but almost all of them are
    * singletons that can never win a merge round against the head of the
    * distribution. `minFreq` filters the word table IN THE DISTRIBUTED AGG
    * before the collect (the standard production-BPE pre-filter): pair
    * counts lose at most (minFreq−1)·|dropped words|·max-word-length mass,
    * so any floor far below the top pair's count (head pairs count in the
    * millions per TB) leaves the learned merges unchanged while bounding
    * the driver table to the true vocabulary. Default 1 = no filter
    * (exact), the right setting at test scale.
    *
    * @return (rank, left, right, weight) — weight = summed word frequency
    *         of the merged pair at selection time. */
  def bpeTrainMerges(docs: DataFrame, textCol: String,
                     nMerges: Int, minFreq: Long = 1L): Seq[(Int, String, String, Long)] = {
    require(minFreq >= 1L, s"bpeTrainMerges: minFreq must be >= 1, got $minFreq")
    var words: Array[(Array[String], Long)] = docs.select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minFreq)
      .collect()
      .map(r => (r.getString(0).split("") :+ "</w>", r.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, n) <- words) {
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), cnt)) if cnt >= 2 =>
          merges += ((rank, a, b, cnt))
          words = words.map { case (syms, n) => (mergePairLocal(syms, a, b), n) }
          rank += 1
        case _ => done = true
      }
    }
    merges.toSeq
  }

  /** Driver twin of [[mergePair]]: greedy left-to-right, a just-merged
    * symbol is never reused as the left side in the same position. */
  private def mergePairLocal(syms: Array[String], a: String,
                             b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == a && syms(i) == b)
        out(out.length - 1) = a + b
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Apply a learned merge table in rank order to a symbol array —
    * BPE-encode. Expression depth grows with the merge count; fine for the
    * tens of merges this trains, and a real deployment bakes the table
    * into a tokenizer anyway. */
  def bpeEncode(syms: Column, merges: Seq[(Int, String, String, Long)]): Column =
    merges.sortBy(_._1).foldLeft(syms) { case (c, (_, a, b, _)) =>
      mergePair(c, a, b)
    }

  /** BPE-encode every document with a trained merge table — the missing
    * half of the tokenizer-training story ([[bpeTrainMerges]] → encode).
    * The merge folds run once per DISTINCT word (vocabulary-scale, same
    * argument as training: a 100 TB corpus grows occurrences, not the
    * vocabulary), then each document aggregates its words' token counts
    * through a broadcast join. The corpus text is scanned ONCE: the
    * explode aggregates straight into the (doc, word, count) matrix —
    * far smaller than the text — which is localCheckpointed (same
    * two-consumer reuse pattern as the banded dedup self-joins) so the
    * vocabulary derivation and the count join don't each rescan the
    * corpus. Words are the training tokenization (lowercase letter runs,
    * `</w>` terminated); docs with no words keep a zero-count row. */
  def bpeEncodeDocs(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(Int, String, String, Long)],
                    docWords0: Option[DataFrame] = None): DataFrame = {
    val docWords = docWords0.getOrElse(docWordMatrix(docs, idCol, textCol))
    val vocab = docWords.select("w").distinct()
      // split(w, "", 0): limit 0 drops the trailing empty string Java's
      // default -1 keeps — symbols must be exactly the word's characters
      .withColumn("toks",
        bpeEncode(concat(split(col("w"), "", 0), array(lit("</w>"))), merges))
      .select(col("w"), size(col("toks")).cast(LongType).as("n_tok"))
    val counts = docWords.join(broadcast(vocab), "w")
      .groupBy(idCol)
      .agg(sum("c").as("n_words"),
        sum(col("c") * col("n_tok")).as("n_bpe_tokens"))
    docs.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .na.fill(0L, Seq("n_words", "n_bpe_tokens"))
  }

  /** ONE corpus text scan aggregated into the (doc, word, count) matrix —
    * far smaller than the text — that every vocabulary-scale consumer
    * (BPE encode, LM scoring, BM25, DSIR) reuses without rescanning the
    * corpus. Words = the training tokenization (lowercase letter runs).
    * Public PLAN form (no checkpoint): callers that reuse the matrix
    * across whole-query invocations stage it as parquet instead
    * (Queries.docWordsStaged — the derivation is priced by
    * q_text_token_count's corpus scan). */
  def docWordMatrixOf(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))

  /** [[docWordMatrixOf]] localCheckpointed — the in-query two-consumer
    * reuse form (the banded dedup self-join pattern). */
  private def docWordMatrix(docs: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    docWordMatrixOf(docs, idCol, textCol).localCheckpoint()

  /** Unigram language-model scoring — train an add-one-smoothed unigram
    * model ON the corpus and score every document's cross-entropy against
    * it: the classic LM-fit quality signal (gibberish, boilerplate, and
    * non-language docs sit far above the corpus's own entropy; FastText/
    * CCNet-era pipelines gate on exactly this number from a KenLM).
    * One corpus text scan ([[docWordMatrix]]); the unigram table is
    * vocabulary-scale and joins back for scoring (corpus grows N, not V).
    * Cross-entropy is emitted in integer MICRO-NATS: `round(1e6 · H(d))`
    * where `H(d) = (1/N_d) Σ_w c_dw · ln((N+V)/(c_w+1))` — not
    * ANSI-oracle-safe (cross-engine `ln`/summation-order ulp drift flips
    * rounded digits), so the declared query is rows-only with an exact
    * driver-twin spec. Docs with no words keep a zero row. */
  def unigramPerplexity(docs: DataFrame, idCol: String,
                        textCol: String,
                        docWords0: Option[DataFrame] = None): DataFrame = {
    val dw = docWords0.getOrElse(docWordMatrix(docs, idCol, textCol))
    // vocabulary-scale unigram table; two consumers (totals agg + score
    // join) ⇒ checkpointed like its parent
    val uni = dw.groupBy("w").agg(sum("c").as("cw")).localCheckpoint()
    val tot = uni.agg(sum("cw"), count(lit(1))).collect()(0) // 1-row agg
    // sum is NULL on an all-empty corpus (no extractable words anywhere);
    // denom's value is then irrelevant — `scored` has no rows — but the
    // read must not NPE, and every doc still gets its (0, 0) row below
    val denom =
      ((if (tot.isNullAt(0)) 0L else tot.getLong(0)) + tot.getLong(1)).toDouble
    val scored = dw.join(uni, "w")
      .withColumn("neglogp",
        -log((col("cw") + lit(1)).cast(DoubleType) / lit(denom)))
      .groupBy(idCol)
      .agg(sum("c").as("n_words"),
        sum(col("c").cast(DoubleType) * col("neglogp")).as("h_sum"))
      .select(col(idCol), col("n_words"),
        round(col("h_sum") / col("n_words") * lit(1e6)).cast(LongType)
          .as("xent_micronats"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_words", "xent_micronats"))
  }

  /** BM25 top-k search — the canonical lexical retrieval scorer
    * (Robertson/Spärck Jones; the Okapi tf saturation + length
    * normalization every search engine ships):
    *   score(d) = Σ_t idf(t) · c_td·(k1+1) / (c_td + k1·(1−b+b·len_d/avg))
    *   idf(t)   = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
    * One corpus scan ([[docWordMatrix]]); scoring touches only the
    * postings of the query's terms (broadcast idf, candidate-side join to
    * per-doc lengths), so cost tracks postings size, not corpus size.
    * Rows-only under the driver gate: ln is not correctly-rounded IEEE
    * (the q_lm_perplexity ruling) — the exact formula and ranking are
    * pinned by a driver twin in spec instead. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75,
                 docWords0: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = queryTerms.map(_.toLowerCase).distinct
    val dw = docWords0.getOrElse(docWordMatrix(docs, idCol, textCol))
    val lens = dw.groupBy(idCol).agg(sum("c").as("len"))
    // N and avg length are over the WHOLE corpus (Robertson's N), not
    // just docs with extractable tokens — zero-token docs count toward N
    // and contribute length 0 to the average
    val n = docs.count()
    val totLen = lens.agg(sum("len")).collect()(0) // 1-row agg
    val avgLen = if (n == 0 || totLen.isNullAt(0)) 1.0
      else totLen.getLong(0).toDouble / n
    // per-term document frequencies: |terms| rows — driver-side idf
    val idf = dw.filter(col("w").isin(terms: _*))
      .groupBy("w").agg(count(lit(1)).as("df")).collect()
      .map(r => (r.getString(0),
        math.log(1.0 + (n - r.getLong(1) + 0.5) / (r.getLong(1) + 0.5))))
      .toSeq.toDF("w", "idf")
    dw.filter(col("w").isin(terms: _*))
      .join(broadcast(idf), Seq("w"))
      .join(lens, Seq(idCol))
      .withColumn("score_t", col("idf") *
        (col("c").cast(DoubleType) * lit(k1 + 1)) /
        (col("c").cast(DoubleType) +
          lit(k1) * (lit(1 - b) + lit(b) * col("len") / lit(avgLen))))
      .groupBy(col(idCol))
      .agg(round(sum("score_t"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** DSIR-style IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * the log-likelihood ratio of a TARGET hashed-unigram distribution
    * (docs flagged by `isTarget` — the high-quality slice you want more
    * of) against the RAW distribution (everything else):
    *   logw(d) = Σ_b n_db · [ln p̂_t(b) − ln p̂_r(b)],
    *   p̂(b) = (c_b + 1)/(T + B)  (add-one over B hash buckets).
    * Resampling the corpus ∝ exp(logw) tilts it toward the target domain —
    * the standard cheap importance-sampling data-selection recipe.
    *
    * Hashing words into `buckets` features (xxhash64, fixed seed) bounds
    * the model at B rows regardless of vocabulary, so the per-bucket
    * log-ratio table BROADCASTS; the corpus pays one text scan
    * ([[docWordMatrix]]) + one bucket hash-agg + one broadcast join.
    * Scores are emitted in integer MICRO-NATS (`round(1e6·logw)`) — ln is
    * not oracle-safe (the [[unigramPerplexity]] ruling) so the declared
    * query is rows-only with an exact driver-twin spec. Docs with no
    * words keep a (0, 0) row.
    *
    * @return (idCol, n_tokens, logw_micronats) — higher = more target-like
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: org.apache.spark.sql.Column,
                  buckets: Int = 4096,
                  docWords0: Option[DataFrame] = None): DataFrame = {
    val dw = docWords0.getOrElse(docWordMatrix(docs, idCol, textCol))
    // per-(doc, bucket) counts: two consumers (model agg + scoring join)
    val db = dw.withColumn("b", pmod(xxhash64(col("w")), lit(buckets)))
      .groupBy(col(idCol), col("b")).agg(sum("c").as("c"))
      .localCheckpoint()
    val flags = docs.select(col(idCol),
      when(isTarget, lit(1L)).otherwise(lit(0L)).as("__t"))
    val model = db.join(flags, Seq(idCol))
      .groupBy("b")
      .agg(sum(when(col("__t") === 1L, col("c")).otherwise(0L)).as("ct"),
        sum(when(col("__t") === 0L, col("c")).otherwise(0L)).as("cr"))
      .localCheckpoint() // ≤ buckets rows; two consumers (totals + join)
    val tot = model.agg(sum("ct"), sum("cr")).collect()(0)
    // empty corpus: sums are NULL, `scored` below has no rows — the
    // denominators' values are irrelevant but must not NPE
    val denT = ((if (tot.isNullAt(0)) 0L else tot.getLong(0)) + buckets).toDouble
    val denR = ((if (tot.isNullAt(1)) 0L else tot.getLong(1)) + buckets).toDouble
    val lam = model.select(col("b"),
      (log((col("ct") + lit(1)).cast(DoubleType) / lit(denT)) -
        log((col("cr") + lit(1)).cast(DoubleType) / lit(denR))).as("lam"))
    val scored = db.join(broadcast(lam), Seq("b"))
      .groupBy(idCol)
      .agg(sum("c").as("n_tokens"),
        round(sum(col("c").cast(DoubleType) * col("lam")) * lit(1e6))
          .cast(LongType).as("logw_micronats"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "logw_micronats"))
  }

  /** Benchmark decontamination — the test-set-overlap removal every LLM
    * training pipeline runs before a corpus ships: a training doc is
    * contaminated when it shares ANY word `k`-gram with the evaluation set.
    * Eval-side distinct grams are bounded (eval sets are thousands of docs,
    * not billions) and broadcast; the per-doc overlap count is one
    * broadcast left-semi equi-join + one map-side-combined hash agg —
    * linear in corpus size, no shuffle of the corpus text. Every train doc
    * is kept in the output with its overlap count so the caller decides
    * filter vs audit. At 100 TB the gram would travel as xxhash64; kept
    * verbatim here so the DuckDB oracle shares the exact join key. */
  def decontaminate(train: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, k: Int): DataFrame = {
    val grams = array_distinct(ngrams(col(textCol), k))
    val evalGrams = broadcast(
      evalSet.select(explode(grams).as("gram")).distinct())
    val overlap = train
      .select(col(idCol), explode(grams).as("gram"))
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Pair-level decontamination AUDIT — the witness table behind
    * [[decontaminate]]'s per-doc verdicts: for every (eval doc, train doc)
    * pair sharing at least one word `k`-gram, the count of the eval doc's
    * distinct grams found in that train doc plus the containment ratio
    * shared/|eval grams| — the statistic an LLM data pipeline inspects to
    * tune the removal rule (and to tell verbatim leaks from idiom
    * collisions) before anything is dropped.
    *
    * Scale shape mirrors [[decontaminate]]: BOTH eval-side frames (per-doc
    * grams and per-doc totals) are bounded by the eval set's size and
    * broadcast; the training corpus streams ONCE through a broadcast hash
    * join, and only MATCHED (pair, gram) rows reach the aggregating
    * shuffle — contamination is rare by construction, so the shuffle is
    * output-scale, not corpus-scale. Grams travel verbatim so the DuckDB
    * oracle shares the exact join key; at 100 TB they'd travel as
    * xxhash64. The ratio divides two exactly-shared longs and rounds to
    * 6 dp (the decAvg convention), so the output is cross-engine exact. */
  def contaminationPairs(train: DataFrame, evalSet: DataFrame, idCol: String,
                         textCol: String, k: Int): DataFrame = {
    val grams = array_distinct(ngrams(col(textCol), k))
    // ONE eval-side pass: the per-doc total rides next to each exploded
    // gram (functionally dependent on eval_id), so no second scan, second
    // broadcast, or totals re-join is needed
    val evalGrams = broadcast(
      evalSet.select(col(idCol).as("eval_id"), grams.as("grams"))
        .select(col("eval_id"),
          size(col("grams")).cast(LongType).as("eval_grams"),
          explode(col("grams")).as("gram")))
    train.select(col(idCol).as("train_id"), explode(grams).as("gram"))
      .join(evalGrams, Seq("gram"))
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("shared_grams"),
        max(col("eval_grams")).as("eval_grams"))
      .withColumn("containment",
        round(col("shared_grams").cast(DoubleType) / col("eval_grams"), 6))
      .select("eval_id", "train_id", "shared_grams", "eval_grams",
        "containment")
  }

  /** Corpus-wide span-level exact dedup — the CCNet line-dedup shape
    * adapted to unstructured text: each doc splits into non-overlapping
    * `spanTokens`-token spans; a span survives only at its FIRST corpus
    * occurrence (global (doc, span_idx) order); docs reconstruct from
    * surviving spans. One shuffle hash-partitioned on the span content
    * (the window never sees more rows per partition than the duplicate
    * multiplicity of one span) + one groupBy doc for reconstruction. At
    * 100 TB the span would be keyed by xxhash64 through the exchange with
    * the text re-attached by id afterwards; kept verbatim here so the
    * DuckDB oracle shares the exact grouping. */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                spanTokens: Int): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive, got $spanTokens")
    val w = tokens(col(textCol))
    // ⌈n/spanTokens⌉ spans: last index (n-1) div spanTokens (ints — the
    // double division is exact for any corpus-plausible token count)
    val spanArr = transform(
      sequence(lit(0), floor((size(w) - 1) / lit(spanTokens)).cast(IntegerType)),
      i => array_join(slice(w, i * spanTokens + 1, lit(spanTokens)), " "))
    val spans = docs.select(col(idCol), posexplode(spanArr))
      .select(col(idCol), col("pos").cast(LongType).as("span_idx"),
        col("col").as("span"))
    val firstWin = Window.partitionBy("span").orderBy(col(idCol), col("span_idx"))
    spans.withColumn("rn", row_number().over(firstWin))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls of dropped spans; struct sort
        // restores span order before the join
        array_join(transform(array_sort(collect_list(
            when(col("rn") === 1, struct(col("span_idx"), col("span"))))),
          s => s.getField("span")), " ").as("text_dedup"))
  }

  /** Gopher-style repetition/quality rule signals (Rae et al. 2021 §A1.1:
    * word-count bounds, mean word length, duplicate-2-gram fraction, top
    * unigram fraction) with per-rule flags and the composed gate. All
    * integer ppm arithmetic ⇒ cross-engine exact. Shapes: one per-doc
    * expression pass for the array metrics + one exploded hash-agg argmax
    * for the top unigram + one narrow id join. */
  def gopherSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = tokens(col(textCol))
    val g2 = ngrams(col(textCol), 2)
    val base = docs.select(col(idCol),
      size(w).cast(LongType).as("n_words"),
      aggregate(w, lit(0L), (acc, x) => acc + length(x)).as("word_chars"),
      size(g2).cast(LongType).as("n_2grams"),
      size(array_distinct(g2)).cast(LongType).as("d_2grams"))
    val top1 = docs.select(col(idCol), explode(w).as("wd"))
      .groupBy(col(idCol), col("wd")).agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max(col("c")).as("top1_count"))
    base.join(top1, Seq(idCol))
      .withColumn("mwl_ppm", expr("word_chars * 1000000 DIV n_words"))
      .withColumn("dup2_ppm", expr("(n_2grams - d_2grams) * 1000000 DIV n_2grams"))
      .withColumn("top1_ppm", expr("top1_count * 1000000 DIV n_words"))
      .withColumn("pass_len", col("n_words").between(25L, 1000L))
      .withColumn("pass_mwl", col("mwl_ppm").between(4000000L, 5000000L))
      .withColumn("pass_rep2", col("dup2_ppm") <= 50000L)
      .withColumn("pass_top1", col("top1_ppm") <= 120000L)
      .withColumn("pass_all",
        col("pass_len") && col("pass_mwl") && col("pass_rep2") && col("pass_top1"))
      .select(idCol, "n_words", "mwl_ppm", "dup2_ppm", "top1_ppm",
        "pass_len", "pass_mwl", "pass_rep2", "pass_top1", "pass_all")
  }

  /** Linear text-classifier scoring — the fastText-style quality-classifier
    * pattern: score = bias + Σ tf(token)·weight over a broadcast weight
    * table, label = score > 0. A real deployment loads trained weights
    * (still metadata-scale, still broadcast); a literal table here keeps
    * the operator oracle-checkable. Integer weights ⇒ exact. */
  def classifierScore(docs: DataFrame, idCol: String, textCol: String,
                      weights: Seq[(String, Long)], bias: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toDF("wd", "weight"))
    val scores = docs.select(col(idCol), explode(tokens(col(textCol))).as("wd"))
      .join(wdf, Seq("wd"))
      .groupBy(idCol).agg(sum(col("weight")).as("wsum"))
    docs.select(col(idCol))
      .join(scores, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("wsum"), lit(0L)) + lit(bias)).as("score"))
      .withColumn("label", col("score") > 0)
  }

  /** Default classifier weights over the synthetic corpus vocabulary. */
  val defaultClassifierWeights: Seq[(String, Long)] = Seq(
    "fast" -> 3L, "slow" -> -3L, "big" -> 2L, "small" -> -2L,
    "query" -> 1L, "table" -> -1L, "vector" -> 2L, "stream" -> 1L,
    "filter" -> -1L, "merge" -> 1L)

  /** Default marker sets for the synthetic corpus's language codes. */
  val defaultMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "des"),
    "zh" -> Seq("的", "是", "了", "在", "我"))
}
