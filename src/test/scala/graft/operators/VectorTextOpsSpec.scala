package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorTextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // near v0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to v0
    (3L, Array(-1.0f, 0.0f, 0.0f))  // opposite of v0
  ).toDF("vec_id", "embedding")

  test("cosine top-k ranks by similarity with exact values") {
    val r = VectorOps.cosineTopK(vecs, vecs.filter($"vec_id" === 0L),
        "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
    assert(math.abs(r(0).getAs[Double]("cosine") - 0.993884) < 1e-6)
    assert(r(1).getAs[Double]("cosine") === 0.0)
    assert(r(2).getAs[Double]("cosine") === -1.0)
  }

  test("LSH ANN: identical vectors share a bucket; opposite vectors do not") {
    val b = vecs.select(col("vec_id"),
      VectorOps.lshBucket(col("embedding"), 8, dims = 3).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) !== b(3L)) // every plane flips sign for the negation
    val ann = VectorOps.cosineTopKLsh(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 3, nPlanes = 4, dims = 3)
    // candidates are bucket-mates only; whatever returns must be ranked right
    val rows = ann.orderBy("rank").collect()
    assert(rows.map(_.getAs[Double]("cosine")).toSeq.sorted.reverse ===
      rows.map(_.getAs[Double]("cosine")).toSeq)
  }

  test("rrfFuse: integer credits, both-lists-good beats single-list-top") {
    // lex ranks n1<n2<n3, vec ranks n2<n3<n1: n2 (2nd+1st) must beat
    // n1 (1st+3rd) — the RRF property the fusion exists for
    val lex = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val vec = Seq((0L, 2L, 1), (0L, 3L, 2), (0L, 1L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val got = VectorOps.rrfFuse(lex, vec).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(2L, 1L, 3L))
    // exact micro-credits: 1e9 div 61/62/63 = 16393442/16129032/15873015
    assert(got(0).getAs[Long]("rrf_micro") === 16129032L + 16393442L)
    assert(got(1).getAs[Long]("rrf_micro") === 16393442L + 15873015L)
    assert(got(2).getAs[Long]("rrf_micro") === 15873015L + 16129032L)
  }

  test("rrfFuse: inner pool — a candidate missing from one ranking is dropped") {
    val lex = Seq((0L, 1L, 1), (0L, 9L, 2)).toDF("query_id", "neighbor_id", "rank")
    val vec = Seq((0L, 1L, 1), (0L, 8L, 2)).toDF("query_id", "neighbor_id", "rank")
    val got = VectorOps.rrfFuse(lex, vec).collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L))
  }

  test("rrfFuseUnion: union pool — single-list candidates kept at zero-credit") {
    // same lists as the inner-pool test: 9 (lex-only) and 8 (vec-only)
    // must survive with NULL carried rank on the missing side and credit
    // from the present side only; 1 (both lists, rank 1+1) beats both
    val lex = Seq((0L, 1L, 1), (0L, 9L, 2)).toDF("query_id", "neighbor_id", "rank")
    val vec = Seq((0L, 1L, 1), (0L, 8L, 2)).toDF("query_id", "neighbor_id", "rank")
    val got = VectorOps.rrfFuseUnion(lex, vec).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 8L, 9L))
    // 1e9 div 61 = 16393442, div 62 = 16129032
    assert(got(0).getAs[Long]("rrf_micro") === 2 * 16393442L)
    assert(got(1).getAs[Long]("rrf_micro") === 16129032L) // vec-only
    assert(got(1).isNullAt(got(1).fieldIndex("rank_a")))  // no lex rank
    assert(got(2).getAs[Long]("rrf_micro") === 16129032L) // lex-only;
    // 8 beats 9 on the id tie-break at equal credit
    assert(got(2).isNullAt(got(2).fieldIndex("rank_b")))
  }

  test("rrfFuseUnion equals rrfFuse when both rankings are dense") {
    val lex = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val vec = Seq((0L, 2L, 1), (0L, 3L, 2), (0L, 1L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val inner = VectorOps.rrfFuse(lex, vec).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getAs[Long]("rrf_micro")))
    val union = VectorOps.rrfFuseUnion(lex, vec).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getAs[Long]("rrf_micro")))
    assert(inner.toSeq === union.toSeq)
  }

  test("IVF ANN returns ranked bucket-mates; embedding near-dup finds close pairs") {
    val emb = graft.Tables.embeddings(spark, sf())
    val ivf = VectorOps.cosineTopKIvf(emb, emb.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 5, nCentroids = 8, nProbe = 2)
      .orderBy("query_id", "rank").collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val cos = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.sorted.reverse.toSeq === cos.toSeq) // ranked descending
    }
    val dups = VectorOps.cosineNearDups(
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.999f, 0.01f)), (3L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups === Set((1L, 2L)))
  }

  test("mmr re-rank: diversity term breaks up a near-duplicate cluster") {
    // Diversity can only beat relevance when candidates cluster among
    // THEMSELVES tighter than they sit to the query (sim(clone,clone) ≈ 1
    // while rel ≈ 0.8): the 7:3 weights then score the diverse candidate
    // 7·0.75 − 3·0.61 above the second clone's 7·0.80 − 3·0.999.
    val corpus = Seq(
      (10L, Array(0.8f, 0.6f, 0.0f)),   // rel 0.80, cluster A
      (11L, Array(0.8f, 0.59f, 0.01f)), // rel 0.805, clone of 10
      (12L, Array(0.75f, 0.0f, 0.66f)), // rel 0.75, diverse (sim to A ≈ 0.6)
      (13L, Array(0.0f, 0.1f, 1.0f))    // rel 0, weak
    ).toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val plain = VectorOps.cosineTopK(corpus, queries, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(plain.take(2).map(_.getAs[Long]("neighbor_id")).toSet === Set(10L, 11L),
      "plain top-2 is the clone cluster")
    // both paths (the GraphOps both-path contract): the driver replay and
    // the distributed greedy rounds must produce the identical selection
    for (cutover <- Seq(100000L, 0L)) {
      val mmr = VectorOps.mmrRerank(corpus, queries, "vec_id", "embedding",
          pool = 4, k = 3, driverFastPathRows = cutover)
        .orderBy("pick").collect()
      val picks = mmr.map(_.getAs[Long]("neighbor_id")).toSeq
      assert(picks.head === plain.head.getAs[Long]("neighbor_id"),
        s"pick 1 is the relevance argmax (cutover=$cutover)")
      assert(picks(1) === 12L,
        s"diversity must pull the diverse candidate to pick 2, got $picks (cutover=$cutover)")
      // rel6 rides through: pick 1's grid value equals the plain cosine ×1e6
      assert(mmr.head.getAs[Long]("rel6") ===
        math.round(plain.head.getAs[Double]("cosine") * 1e6),
        s"cutover=$cutover")
    }
  }

  test("mmr re-rank: distributed rounds equal the driver replay on random vectors") {
    // the driver fast path replays dotFixed's floored long grid, Spark's
    // HALF_UP round, and the cand ASC tie-break — random floats probe all
    // three (a grid or rounding drift shows up as a different pick order)
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val n = 12 + rnd.nextInt(8)
      val dim = 6
      val corpus = (1L to n).map(i =>
        (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
        .toDF("vec_id", "embedding")
      val queries = Seq((100L, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)),
        (101L, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
        .toDF("vec_id", "embedding")
      def run(cutover: Long) =
        VectorOps.mmrRerank(corpus, queries, "vec_id", "embedding",
            pool = 6, k = 4, driverFastPathRows = cutover)
          .collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
            r.getAs[Int]("pick"), r.getAs[Long]("rel6"))).toSet
      assert(run(100000L) === run(0L), s"trial $trial: paths diverged")
    }
  }

  test("mmr re-rank: string ids tie-break identically on both paths") {
    // identical vectors force EVERY pick to the cand ASC tie-break — the
    // exact surface where a driver collation bug would diverge
    val v = Array(0.6f, 0.8f, 0.0f)
    val corpus = Seq("b", "a", "c", "d").map((_, v)).toDF("vec_id", "embedding")
    val queries = Seq(("q", Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    def run(cutover: Long) =
      VectorOps.mmrRerank(corpus, queries, "vec_id", "embedding",
          pool = 4, k = 3, driverFastPathRows = cutover)
        .orderBy("pick").collect()
        .map(r => (r.getAs[String]("neighbor_id"), r.getAs[Int]("pick"))).toSeq
    val fast = run(100000L)
    assert(fast === run(0L), "paths diverged on the tie-break")
    assert(fast.map(_._1) === Seq("a", "b", "c"))
  }

  test("mmrRerankOver: caller-nominated candidates bound the pool; both paths agree") {
    // candidate-restricted MMR (the RAG composition's re-rank stage): only
    // nominated ids may be picked — the top-relevance corpus vector that
    // is NOT a candidate must never appear; both greedy paths identical
    val rnd = new scala.util.Random(47)
    val corpus = (1L to 16L).map(i =>
      (i, Array.fill(5)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array.fill(5)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val cands = Seq((100L, 2L), (100L, 3L), (100L, 5L), (100L, 7L),
      (100L, 11L), (100L, 13L)).toDF("query_id", "neighbor_id")
    def run(cutover: Long) =
      VectorOps.mmrRerankOver(cands, corpus, queries, "vec_id", "embedding",
          k = 4, driverFastPathRows = cutover)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Int]("pick"), r.getAs[Long]("rel6"))).toSet
    val fast = run(100000L)
    assert(fast === run(0L), "paths diverged")
    val pickedIds = fast.map(_._2)
    assert(pickedIds.subsetOf(Set(2L, 3L, 5L, 7L, 11L, 13L)),
      s"picked a non-candidate: $pickedIds")
    assert(fast.size === 4)
    // pick 1 is the relevance argmax WITHIN the candidate set
    val relTop = VectorOps.cosineTopK(corpus, queries, "vec_id", "embedding",
        k = 16).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(_.getAs[Long]("neighbor_id"))
      .find(Set(2L, 3L, 5L, 7L, 11L, 13L)).get
    assert(fast.find(_._3 == 1).get._2 === relTop)
  }

  test("mmrRerankOver self-excludes a candidate list nominating the query (ADVICE r18 #2)") {
    // a retrieval stage that nominates the query document itself must not
    // hand it the guaranteed rel6=1e6 first pick — the operator filters
    // cand != query_id like mmrRerank's own pool does
    val rnd = new scala.util.Random(53)
    val corpus = (1L to 8L).map(i =>
      (i, Array.fill(4)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 3L)
    val cands = Seq((3L, 3L), (3L, 1L), (3L, 2L), (3L, 5L))
      .toDF("query_id", "neighbor_id")
    val picked = VectorOps.mmrRerankOver(cands, corpus, queries, "vec_id",
        "embedding", k = 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(!picked.contains(3L), s"query picked itself: $picked")
    assert(picked === Set(1L, 2L, 5L))
  }

  test("k-center farthest-first picks one representative per cluster") {
    // three orthogonal clusters of identical vectors: the traversal must
    // take exactly one member of each before ever revisiting a cluster
    val corpus = (Seq(1L, 2L, 3L).map((_, Array(1.0f, 0.0f, 0.0f))) ++
      Seq(4L, 5L, 6L).map((_, Array(0.0f, 1.0f, 0.0f))) ++
      Seq(7L, 8L, 9L).map((_, Array(0.0f, 0.0f, 1.0f))))
      .toDF("vec_id", "embedding")
    for (cutover <- Seq(100000L, 0L)) {
      val got = VectorOps.kCenterSelect(corpus, "vec_id", "embedding", k = 3,
          driverFastPathRows = cutover)
        .orderBy("pick").collect()
        .map(r => (r.getAs[Long]("center_id"), r.getAs[Int]("pick"),
          r.getAs[Long]("maxsim6")))
      // seed = min id; ties at maxsim 0 break to the smallest id
      assert(got.toSeq === Seq((1L, 1, 1000000L), (4L, 2, 0L), (7L, 3, 0L)),
        s"cutover=$cutover")
    }
  }

  test("k-center: distributed rounds equal the driver replay on random vectors") {
    // random floats probe the replay's grid/rounding/running-max exactly
    // like the mmr sweep; the running max-to-newest must equal the
    // distributed per-round max over ALL selected centers
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 3) {
      val n = 10 + rnd.nextInt(10)
      val corpus = (1L to n).map(i =>
        (i, Array.fill(5)(rnd.nextFloat() * 2f - 1f)))
        .toDF("vec_id", "embedding")
      def run(cutover: Long) =
        VectorOps.kCenterSelect(corpus, "vec_id", "embedding", k = 5,
            driverFastPathRows = cutover)
          .collect()
          .map(r => (r.getAs[Long]("center_id"), r.getAs[Int]("pick"),
            r.getAs[Long]("maxsim6"))).toSet
      assert(run(100000L) === run(0L), s"trial $trial: paths diverged")
    }
  }

  test("k-center: string ids seed and tie-break identically on both paths") {
    val v = Array(0.6f, 0.8f)
    val corpus = Seq("m", "b", "x", "a2").map((_, v)).toDF("vec_id", "embedding")
    def run(cutover: Long) =
      VectorOps.kCenterSelect(corpus, "vec_id", "embedding", k = 3,
          driverFastPathRows = cutover)
        .orderBy("pick").collect()
        .map(r => (r.getAs[String]("center_id"), r.getAs[Int]("pick"))).toSeq
    val fast = run(100000L)
    assert(fast === run(0L), "paths diverged on seed/tie-break")
    // identical vectors: seed = binary-min id, then maxsim ties (1e6)
    // resolve by cand ASC
    assert(fast.map(_._1) === Seq("a2", "b", "m"))
  }

  test("int8 quantization: codes in range, reconstruction within one scale unit") {
    val mixed = vecs.union(
      Seq((4L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")) // zero vec
    val q = VectorOps.quantizeInt8(mixed, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val src = mixed.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(q.length === 5 * 3)
    q.foreach { case (id, pos, code, scale) =>
      assert(code >= -127 && code <= 127, s"code $code out of range")
      val x = src(id)(pos.toInt - 1).toDouble
      if (scale == 0.0) assert(code === 0)
      else assert(math.abs(x - code * scale) < scale,
        s"vec $id pos $pos: |$x - $code*$scale| >= scale")
    }
    // the max element hits ±127 exactly
    assert(q.filter(_._1 == 0L).map(_._3).max === 127)
    assert(q.filter(_._1 == 3L).map(_._3).min === -127)
  }

  test("randomProject: JL geometry preserved on average, duplicates project identically") {
    val emb = graft.Tables.embeddings(spark, sf()) // 500 × 64-dim
    val proj = VectorOps.randomProject(emb, "vec_id", "embedding", outDims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(proj.length === 500 * 16)
    val y = proj.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    val x = emb.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(_.toDouble)).toMap
    // E[||y||²] = ||x||² for ±1/√d projections: per-vector ratios are noisy
    // at d=16 (χ² spread) but the corpus MEAN concentrates hard
    val ratios = x.keys.toSeq.map { id =>
      val ny = y(id).map(v => v * v).sum
      val nx = x(id).map(v => v * v).sum
      ny / nx
    }
    val mean = ratios.sum / ratios.size
    info(f"norm-ratio mean over 500 vectors: $mean%.3f")
    assert(mean > 0.85 && mean < 1.15, s"JL norm preservation broke: mean=$mean")
    assert(ratios.count(r => r > 0.2 && r < 3.0) >= 490,
      "individual norm ratios outside any plausible JL band")
    // identical inputs project identically (pure function of the vector)
    val dup = Seq((1L, Array.fill(64)(0.5f)), (2L, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val dp = VectorOps.randomProject(dup, "vec_id", "embedding", outDims = 16)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq).toMap
    assert(dp(1L) === dp(2L))
  }

  test("quality metrics compute exact ratios") {
    val docs = Seq((1L, "the cat the cat runs", 20L)).toDF("doc_id", "text", "n_chars")
    val m = TextOps.qualityMetrics(docs).collect().head
    assert(m.getAs[Long]("n_words") === 5L)
    assert(m.getAs[Long]("n_distinct_words") === 3L)
    assert(m.getAs[Double]("stopword_ratio") === 0.4) // "the" twice / 5
    assert(m.getAs[Double]("dedup_ratio") === 0.6)
  }

  test("piiScrub counts and redacts emails, phones, IPv4 per class") {
    val docs = Seq(
      (1L, "write a@b.com and c.d+x@e.org now"),
      (2L, "call +1-555-123-4567 or +44-201-555-0199"),
      (3L, "host 192.168.1.254 gateway 10.0.0.1"),
      (4L, "clean text no pii")).toDF("doc_id", "text")
    val got = TextOps.piiScrub(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_emails"),
        r.getAs[Long]("n_phones"), r.getAs[Long]("n_ips"),
        r.getAs[String]("redacted")))
    assert(got(0) === ((1L, 2L, 0L, 0L, "write <EMAIL> and <EMAIL> now")))
    assert(got(1) === ((2L, 0L, 2L, 0L, "call <PHONE> or <PHONE>")))
    assert(got(2) === ((3L, 0L, 0L, 2L, "host <IP> gateway <IP>")))
    assert(got(3) === ((4L, 0L, 0L, 0L, "clean text no pii")))
  }

  test("bpe-ish tokenizer splits words, digits, punctuation") {
    val r = Seq("hello, world42 x!").toDF("text")
      .select(TextOps.bpeishTokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(r === Seq("hello", ",", "world", "42", "x", "!"))
  }

  test("fingerprint is word-order insensitive") {
    val fps = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"), (3L, "alpha beta delta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("langid predicts from marker tokens deterministically") {
    val docs = Seq(
      (1L, "der hund und die katze ist hier"),
      (2L, "le chat et les oiseaux des arbres"),
      (3L, "xyzzy plugh")) // no markers -> lexicographically first lang
      .toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
        TextOps.langIdPredict(col("text"), TextOps.defaultMarkers).as("p"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "de")
    assert(r(2L) === "fr")
    assert(r(3L) === "de") // deterministic tie-break
  }

  test("multimodal decode plumbing: schema, determinism, null payloads (Y4M video codec)") {
    val docs = Seq((1L, "payload-a"), (2L, "payload-b"), (3L, null))
      .toDF("doc_id", "txt")
      .select(col("doc_id"), col("txt").cast("binary").as("src"))
    val vids = MultimodalOps.encodePayloads(spark, docs, "doc_id", "src",
      MultimodalOps.encodeY4m)
    val f = MultimodalOps.decodeFeatures(spark, vids, "doc_id", "payload",
      MultimodalOps.decodeVideoFrames)
    val rows = f.orderBy("doc_id").collect()
    assert(f.columns.toSeq === Seq("doc_id", "width", "height", "n_frames", "feature"))
    // feature = one luma sum per frame
    assert(rows(0).getAs[Seq[Float]]("feature").length ===
      MultimodalOps.videoFrameCount("payload-a".getBytes("UTF-8").length))
    assert(rows(2).getAs[Int]("width") === 0) // null payload -> zero features
    // deterministic: same payload, same features
    val again = MultimodalOps.decodeFeatures(spark, vids, "doc_id", "payload",
        MultimodalOps.decodeVideoFrames)
      .orderBy("doc_id").collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("real Y4M codec: encode→decode round-trips dims, frame count, exact luma sums") {
    // plain-JVM twin: derive expected per-frame luma sums straight from the
    // byte→plane rule — the decoder must recover them by genuinely parsing
    // the container (header tokens, FRAME markers, plane extents)
    for (txt <- Seq("payload-a", "x", "a much longer payload with spaces and 1234567890 digits")) {
      val src = txt.getBytes("UTF-8")
      val y4m = MultimodalOps.encodeY4m(src)
      assert(new String(y4m.take(10), "US-ASCII") === "YUV4MPEG2 ")
      val (ew, eh) = MultimodalOps.imageDims(src.length)
      val enf = MultimodalOps.videoFrameCount(src.length)
      val n = src.length
      val expected = Array.tabulate(enf) { f =>
        (0 until ew * eh).map(i => (src((i + 13 * f) % n) & 0xff).toLong).sum.toFloat
      }
      val (w, h, nf, sums) = MultimodalOps.decodeVideoFrames(y4m)
      assert((w, h, nf) === ((ew, eh, enf)))
      assert(sums.toSeq === expected.toSeq)
    }
    // quarantine convention: null / truncated / non-Y4M payloads -> zeros
    assert(MultimodalOps.decodeVideoFrames(null)._3 === 0)
    assert(MultimodalOps.decodeVideoFrames("not a video".getBytes)._3 === 0)
    val whole = MultimodalOps.encodeY4m("payload-a".getBytes)
    assert(MultimodalOps.decodeVideoFrames(whole.take(whole.length - 1))._3 === 0)
  }

  test("real PNG codec: encode→decode round-trips dims and exact channel sums") {
    // plain-JVM twin: derive expected sums straight from the byte→pixel
    // rule, no ImageIO — the decode must recover them from the compressed
    // payload (PNG is lossless, so this is exact, not approximate)
    def expected(src: Array[Byte]): (Int, Int, Long, Long, Long) = {
      val (w, h) = MultimodalOps.imageDims(src.length)
      val n = src.length
      var sr = 0L; var sg = 0L; var sb = 0L
      for (i <- 0 until w * h) {
        sr += src((3 * i) % n) & 0xff
        sg += src((3 * i + 1) % n) & 0xff
        sb += src((3 * i + 2) % n) & 0xff
      }
      (w, h, sr, sg, sb)
    }
    for (txt <- Seq("payload-a", "x", "a much longer payload with spaces and 1234567890 digits")) {
      val src = txt.getBytes("UTF-8")
      val png = MultimodalOps.encodePng(src)
      // a real PNG file: magic bytes present, bigger than a trivial stub
      assert(png.take(8).toSeq === Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      val (w, h, nf, feat) = MultimodalOps.decodeImage(png)
      val (ew, eh, esr, esg, esb) = expected(src)
      assert((w, h, nf) === (ew, eh, 1))
      assert(feat.map(_.toLong).toSeq === Seq(esr, esg, esb))
    }
    // undecodable and empty payloads quarantine to zeros
    for (bad <- Seq("not a png".getBytes, Array.empty[Byte])) {
      val (w, h, nf, feat) = MultimodalOps.decodeImage(bad)
      assert((w, h, nf) === ((0, 0, 0)) && feat.isEmpty)
    }
    assert(MultimodalOps.encodePng(null).isEmpty)
  }

  test("resizePng: identity resize preserves the raster; NN math matches a driver twin") {
    val src = "resize me please 123".getBytes("UTF-8")
    val png = MultimodalOps.encodePng(src)
    val (w, h, _, feat) = MultimodalOps.decodeImage(png)
    // identity: outW=w, outH=h → x*w/w = x, y*h/h = y — bit-equal sums
    val same = MultimodalOps.resizePng(png, w, h)
    val (w2, h2, _, feat2) = MultimodalOps.decodeImage(same)
    assert((w2, h2) === ((w, h)) && feat2.toSeq === feat.toSeq)
    // NN twin: recompute the 5x4 resize channel sums straight from the
    // byte→pixel rule, no ImageIO
    val out = MultimodalOps.resizePng(png, 5, 4)
    val (w3, h3, nf3, feat3) = MultimodalOps.decodeImage(out)
    assert((w3, h3, nf3) === ((5, 4, 1)))
    val n = src.length
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until 4; x <- 0 until 5) {
      val i = (y * h / 4) * w + (x * w / 5)
      er += src((3 * i) % n) & 0xff
      eg += src((3 * i + 1) % n) & 0xff
      eb += src((3 * i + 2) % n) & 0xff
    }
    assert(feat3.map(_.toLong).toSeq === Seq(er, eg, eb))
    // quarantine convention: empty/undecodable resize to empty
    assert(MultimodalOps.resizePng(Array.empty[Byte], 5, 4).isEmpty)
    assert(MultimodalOps.resizePng("not a png".getBytes, 5, 4).isEmpty)
    intercept[IllegalArgumentException] { MultimodalOps.resizePng(png, 0, 4) }
  }

  test("multi-frame GIF codec: lossless round trip, per-frame sums match the byte rule") {
    for (txt <- Seq("animate me", "x", "a longer multi frame payload 0123456789")) {
      val src = txt.getBytes("UTF-8")
      val gif = MultimodalOps.encodeGif(src)
      // a real GIF file: magic bytes
      assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"))
      val (w, h, nf, sums) = MultimodalOps.decodeGifFrames(gif)
      val (ew, eh) = MultimodalOps.imageDims(src.length)
      val n = src.length
      assert((w, h, nf) === ((ew, eh, MultimodalOps.gifFrameCount(n))))
      // driver twin: frame f's sum from the byte rule, no ImageIO
      val expected = (0 until nf).map { f =>
        (0 until w * h).map(i => (src((i + 7 * f) % n) & 0xff).toLong).sum
      }
      assert(sums.map(_.toLong).toSeq === expected,
        "indexed-gray GIF must round-trip every pixel exactly")
    }
    // quarantine convention
    assert(MultimodalOps.decodeGifFrames(Array.empty[Byte]) === ((0, 0, 0, Array.empty[Float])) ||
      MultimodalOps.decodeGifFrames(Array.empty[Byte])._3 === 0)
    assert(MultimodalOps.encodeGif(null).isEmpty)
  }

  test("piiScrub equals a java.util.regex replay on randomly planted PII") {
    import java.util.regex.Pattern
    val rnd = new scala.util.Random(17)
    def word = ("" + ('a' + rnd.nextInt(26)).toChar) * (1 + rnd.nextInt(5))
    def piiTok(kind: Int): String = kind match {
      case 0 => s"u${rnd.nextInt(100)}@ex${rnd.nextInt(10)}.org"
      case 1 => s"+${1 + rnd.nextInt(99)}-${100 + rnd.nextInt(900)}-" +
        s"${100 + rnd.nextInt(900)}-${1000 + rnd.nextInt(9000)}"
      case _ => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}." +
        s"${rnd.nextInt(256)}.${rnd.nextInt(256)}"
    }
    val texts = (1L to 60L).map { id =>
      val toks = Seq.fill(3 + rnd.nextInt(8))(word) ++
        Seq.fill(rnd.nextInt(3))(piiTok(rnd.nextInt(3)))
      (id, rnd.shuffle(toks).mkString(" "))
    }
    val got = TextOps.piiScrub(texts.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    val e = Pattern.compile(TextOps.EmailPattern)
    val ip = Pattern.compile(TextOps.Ipv4Pattern)
    val ph = Pattern.compile(TextOps.PhonePattern)
    def n(p: Pattern, s: String) = {
      val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
    }
    texts.zip(got).foreach { case ((id, t), r) =>
      assert(r.getAs[Long]("n_emails") === n(e, t), s"doc $id: $t")
      assert(r.getAs[Long]("n_phones") === n(ph, t), s"doc $id: $t")
      assert(r.getAs[Long]("n_ips") === n(ip, t), s"doc $id: $t")
      val red = ph.matcher(ip.matcher(e.matcher(t).replaceAll("<EMAIL>"))
        .replaceAll("<IP>")).replaceAll("<PHONE>")
      assert(r.getAs[String]("redacted") === red, s"doc $id: $t")
    }
  }

  test("WAV codec: genuine RIFF payload, exact feature round trip, quarantine on garbage") {
    // bytes {100, 200} alternate: samples alternate (100-128)*256 = -7168
    // and (200-128)*256 = +18432 -> every adjacent pair crosses zero
    val src = Array.tabulate(10)(i => (if (i % 2 == 0) 100 else 200).toByte)
    val wav = MultimodalOps.encodeWav(src)
    val ns = MultimodalOps.audioSamples(10) // 210
    // the JDK's own audio stack parses it — a REAL wav file, not a blob
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate === 8000f)
    assert(ais.getFormat.getChannels === 1)
    assert(ais.getFrameLength === ns.toLong)
    val (sr, n, energy, zc, peak) = MultimodalOps.decodeAudio(wav)
    assert((sr, n) === ((8000, ns)))
    // sample i reads byte (2i)%10 — always an EVEN index ⇒ every sample
    // is -7168: zero energy variation, no crossings, peak 7168
    assert(energy === ns.toLong * 7168L * 7168L)
    assert(zc === 0L)
    assert(peak === 7168L)
    // an odd stride source: bytes {100,200,...} at (2i)%9 alternate parity
    val src9 = Array.tabulate(9)(i => (if (i % 2 == 0) 100 else 200).toByte)
    val (_, n9, _, zc9, peak9) = MultimodalOps.decodeAudio(
      MultimodalOps.encodeWav(src9))
    // (2i)%9 walks 0,2,4,6,8,1,3,5,7,0,… — 4 even→odd/odd→even parity
    // flips per 9-sample period plus the wrap, each a sign change
    assert(zc9 > 0L && peak9 === 18432L)
    assert(n9 === MultimodalOps.audioSamples(9))
    // quarantine: nulls, empties, and non-WAV bytes all zero out
    assert(MultimodalOps.decodeAudio(null) === ((0, 0, 0L, 0L, 0L)))
    assert(MultimodalOps.decodeAudio(Array.empty[Byte]) === ((0, 0, 0L, 0L, 0L)))
    assert(MultimodalOps.decodeAudio(Array.fill(64)(7.toByte)) === ((0, 0, 0L, 0L, 0L)))
  }

  test("dHash: monotone gradients pin the bit order; equal payloads share a hash") {
    // n=221 ⇒ dims exactly 8×8 (221%17=0, (221//17)%13=0) and 3·w·h=192
    // ≤ 221, so no byte-rule wraparound: pixel i's gray = 3i+1, strictly
    // increasing along every row ⇒ every dHash bit (gray(x)>gray(x+1)) is
    // 0. The reversed ramp flips the comparisons — EXCEPT bit x=0 of each
    // row: the 9-wide NN sample over an 8-wide raster duplicates the first
    // column (sx = x*8/9 gives 0,0,1,…), so gray(0)=gray(1) and the bit
    // stays 0 ⇒ 0111'1111 = 0x7f per row. Pins the bit order, the
    // MSB-first nibble packing, the gray rule, AND the NN duplication.
    val up = MultimodalOps.encodePng(Array.tabulate(221)(i => i.toByte))
    val down = MultimodalOps.encodePng(Array.tabulate(221)(i => (220 - i).toByte))
    assert(MultimodalOps.dHash(up) === "0000000000000000")
    assert(MultimodalOps.dHash(down) === "7f7f7f7f7f7f7f7f")
    assert(MultimodalOps.dHash(null) === null)
    assert(MultimodalOps.dHash(Array.empty[Byte]) === null)
    // distributed pass: byte-equal payloads share a hash, others don't (here)
    val rows = Seq(
      (1L, Array.tabulate(221)(i => i.toByte)),
      (2L, Array.tabulate(221)(i => i.toByte)),
      (3L, Array.tabulate(221)(i => (220 - i).toByte)))
      .map { case (id, b) => (id, MultimodalOps.encodePng(b)) }
      .toDF("doc_id", "payload")
    val got = MultimodalOps.dhashPayloads(spark, rows, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === got(2L) && got(1L) === "0000000000000000")
    assert(got(3L) === "7f7f7f7f7f7f7f7f")
  }

  test("real PNG codec distributes: encodePayloads→decodeFeatures over a frame") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, null))
      .toDF("doc_id", "txt")
      .select(col("doc_id"), col("txt").cast("binary").as("src"))
      .repartition(3)
    val pngs = MultimodalOps.encodePayloads(spark, docs, "doc_id", "src")
    assert(pngs.columns.toSeq === Seq("doc_id", "payload"))
    val f = MultimodalOps.decodeFeatures(spark, pngs, "doc_id", "payload")
      .orderBy("doc_id").collect()
    val (w1, h1) = MultimodalOps.imageDims("alpha beta".getBytes.length)
    assert((f(0).getAs[Int]("width"), f(0).getAs[Int]("height")) === ((w1, h1)))
    assert(f(0).getAs[Int]("n_frames") === 1)
    assert(f(2).getAs[Int]("width") === 0) // null source -> empty payload -> zeros
  }

  test("multimodal resize + frame-sample compose with decode") {
    // resize: exact average-pool semantics on a known array
    assert(MultimodalOps.resizeStub(Seq(1f, 3f, 5f, 7f), 2).toSeq === Seq(2f, 6f))
    assert(MultimodalOps.resizeStub(Seq(2f, 4f), 4).toSeq === Seq(2f, 2f, 4f, 4f))
    assert(MultimodalOps.resizeStub(Seq.empty, 4).isEmpty)

    val docs = Seq((1L, "payload-a"), (2L, "payload-b"))
      .toDF("doc_id", "txt")
      .select(col("doc_id"), col("txt").cast("binary").as("src"))
    val vids = MultimodalOps.encodePayloads(spark, docs, "doc_id", "src",
      MultimodalOps.encodeY4m)
    val f = MultimodalOps.decodeFeatures(spark, vids, "doc_id", "payload",
      MultimodalOps.decodeVideoFrames)
    // 9-byte payloads -> 4 frames (videoFrameCount) -> 4-dim luma feature
    val r = MultimodalOps.resizeFeatures(spark, f, "doc_id", "feature", 2)
    val rows = r.orderBy("doc_id").collect()
    assert(r.columns.toSeq === Seq("doc_id", "feature_resized"))
    assert(rows.forall(_.getSeq[Float](1).length === 2))
    // resized cell = mean of its source slice (4 -> 2: pairwise means)
    val feat = f.orderBy("doc_id").collect()(0).getSeq[Float](4)
    assert(rows(0).getSeq[Float](1)(0) === (feat(0) + feat(1)) / 2f)

    // frame-sample plan: stride-2 indices bounded by n_frames
    val frames = f.select(col("doc_id"), col("n_frames"),
        MultimodalOps.frameSamplePlan(col("n_frames"), 2).as("idx"))
      .orderBy("doc_id").collect()
    frames.foreach { row =>
      val nf = row.getAs[Int]("n_frames")
      val idx = row.getSeq[Int](2)
      assert(idx.toSeq === (0 until nf by 2).toSeq)
    }
  }

  test("normalizeText: NFC + casefold + collapse land composed/decomposed twins " +
      "on one form (VERDICT r18 #5)") {
    val rows = Seq(
      ("comp", "x" + TextOps.PlantComposed),
      ("dec", "x" + TextOps.PlantDecomposed),
      ("ascii", "  Already   CLEAN\ttext\n"),
      ("empty", ""))
      .toDF("k", "t")
      .select($"k", TextOps.normalizeText($"t").as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("comp") === "x café déjà")
    assert(rows("dec") === rows("comp"),
      "decomposed spelling must normalize to the composed twin's form")
    assert(rows("ascii") === "already clean text")
    assert(rows("empty") === "")
    // the NFC kernel alone: decomposed e+U+0301 composes; ASCII identity;
    // null propagates
    val nfc = Seq(Some("e\u0301"), Some("plain"), None).toDF("t")
      .select(graft.plans.TextExpressions.nfc($"t").as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(nfc(0) === Some("\u00E9"))
    assert(nfc(1) === Some("plain"))
    assert(nfc(2) === None)
  }
}
