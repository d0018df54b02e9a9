package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-duplicate tests: each near-dup path must find a planted clone and
  * must not pair unrelated docs. */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  // base doc, a near-clone (one word changed), and two unrelated docs
  private val base =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val cloneDoc =
    "the quick brown fox jumps over the lazy cat near the quiet river bank today"
  private val other =
    "completely different content about spark engines and columnar execution plans"
  private val docs = Seq(
    (1L, base, "en", "s0"),
    (2L, cloneDoc, "en", "s0"),
    (3L, other, "en", "s0"),
    (4L, base, "en", "s0") // exact duplicate of 1
  ).toDF("doc_id", "text", "lang", "source")

  test("exact dedup groups identical texts with min-id keeper") {
    val r = DedupOps.exact(docs, "text", "doc_id")
      .orderBy("keeper_id").collect()
    assert(r.length === 3)
    val dup = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper_id") === 1L)
  }

  test("jaccard near-dup finds the planted clone, not the unrelated doc") {
    val pairs = DedupOps.jaccardNearDups(docs, "doc_id", "text",
        Seq("lang", "source"), k = 3, threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((1L, 2L))) // clone found
    assert(pairSet.contains((1L, 4L))) // exact dup found (jac = 1.0)
    assert(!pairSet.exists { case (a, b) => a == 3L || b == 3L }) // no false pair
    val exact = pairs.find(r => (r.getLong(0), r.getLong(1)) == ((1L, 4L))).get
    assert(exact.getAs[Double]("jac") === 1.0)
  }

  test("minhash LSH finds the planted clone with exact-jaccard verification") {
    val pairs = DedupOps.minhashLshNearDups(docs, "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))  // identical docs always share all bands
    assert(pairs.contains((1L, 2L)))  // high-jaccard clone caught by banding
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash FIXED variant: same contract as the production family; driver-twin signature") {
    val pairs = DedupOps.minhashLshNearDupsFixed(docs, "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))  // identical docs share every band
    // NOTE no (1,2) assertion: banding is probabilistic per hash FAMILY —
    // this family happens to put the clone's bands apart on the tiny
    // fixture (P(catch) ≈ 1−(1−J⁴)⁸; the sf0.01 gate shows 25 verified
    // pairs, same as production). Only soundness is contractual:
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
    // driver twin of the whole signature pipeline: poly-hash the shingles
    // and take affine-permutation minima in plain Scala — the Spark
    // column pipeline must agree bit-for-bit (the DuckDB oracle replays
    // this same arithmetic, so the twin pins the cross-engine contract)
    val p = DedupOps.MinhashFixedP
    def poly(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c) % p)
    val text = docs.filter(col("doc_id") === 1L).select("text").head.getString(0)
    val words = text.split(" ", -1)
    val sh = (0 until math.max(words.length - 3, 0) + 1)
      .map(i => words.slice(i, i + 3).mkString(" ")).map(poly).distinct.sorted
    val coeffs = DedupOps.minhashFixedCoeffs(32)
    val expectedSig = coeffs.map { case (a, b) => sh.map(x => (x * a + b) % p).min }
    val row = DedupOps.minhashFixedSignatures(
        docs.filter(col("doc_id") === 1L), "doc_id", "text", k = 3,
        numHashes = 32).head
    assert(row.getSeq[Long](1) === sh)          // shingle poly-hashes agree
    assert(row.getSeq[Long](2) === expectedSig) // 32 permutation minima agree
    val exactPair = DedupOps.minhashLshNearDupsFixed(
        docs.filter(col("doc_id").isin(1L, 4L)), "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .collect()
    assert(exactPair.length === 1) // 1-4 identical: one verified pair, jac 1.0
    assert(exactPair.head.getAs[Double]("jac") === 1.0)
  }

  test("simhash hamming distance: 0 for identical, small for clone, large for unrelated") {
    val sigs = DedupOps.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(4L)) // identical text -> identical signature
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
    val pairs = DedupOps.simhashNearDups(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash FIXED variant: clone contract; driver-twin 62-bit signature") {
    val pairs = DedupOps.simhashNearDupsFixed(docs, "doc_id", "text",
        maxDist = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical text -> identical signature
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
    // driver twin: recompute the full 62-bit signature in plain Scala —
    // poly-hash each distinct token, 62 affine bit votes (strict >0 tie
    // rule), power-of-two packing — the exact arithmetic the DuckDB
    // oracle replays
    val p = DedupOps.MinhashFixedP
    def poly(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c) % p)
    val (as, bs) = DedupOps.simhashFixedCoeffs()
    val text = docs.filter(col("doc_id") === 1L).select("text").head.getString(0)
    val codes = text.split(" ", -1).distinct.map(poly)
    val expected = (0 until DedupOps.SimhashFixedBits).map { b =>
      val vote = codes.map(x =>
        if ((x * as(b) + bs(b)) % p >= 1073741824L) 1 else -1).sum
      if (vote > 0) 1L << b else 0L
    }.sum
    val got = DedupOps.simhashFixedSignatures(
      docs.filter(col("doc_id") === 1L), "doc_id", "text").head.getLong(1)
    assert(got === expected)
    assert(got >= 0L && got < (1L << 62), "signature stays in the 62-bit range")
  }

  test("hot-bucket cap bounds degenerate mass-duplicate buckets") {
    // 1500 copies of the same boilerplate collapse to ONE signature: without
    // the (band, bucket) cap the band self-join would materialize ~1.1M
    // pairs from that single bucket. With the cap, the hot bucket is dropped
    // (mass-identical docs are exact-dedup's job) and the planted distinct
    // near-dup pairs are still found.
    val boiler =
      "lorem ipsum dolor sit amet the same boilerplate footer text every time"
    val degenerate = (100L until 1600L).map(i => (i, boiler, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val all = docs.union(degenerate)
    val mh = DedupOps.minhashLshNearDups(all, "doc_id", "text",
        k = 3, bands = 8, rowsPerBand = 4, threshold = 0.5, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((1L, 4L)) && mh.contains((1L, 2L)))
    assert(!mh.exists { case (a, b) => a >= 100L || b >= 100L })
    assert(mh.size < 10) // bounded: no quadratic bucket ever materialized
    val sh = DedupOps.simhashNearDups(all, "doc_id", "text",
        maxDist = 3, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.contains((1L, 4L)))
    assert(!sh.exists { case (a, b) => a >= 100L || b >= 100L })
  }

  test("simhash banding recovers every ≤3-bit pair at multiple block configs") {
    // planted signatures with known Hamming distances; the ≤maxDist
    // guarantee must hold at the classic 4-block config AND the wider
    // 6-block (C(6,3)=20 bands, ~32-bit keys) scale config
    val base = 0x0123456789abcdefL
    def flip(s: Long, bits: Int*): Long =
      bits.foldLeft(s)((x, b) => x ^ (1L << b))
    val sigs = Seq(
      10L -> base,
      11L -> flip(base, 5),          // d=1
      12L -> flip(base, 3, 40),      // d=2, bits in different blocks
      13L -> flip(base, 0, 21, 63),  // d=3, three distinct blocks (worst case)
      14L -> flip(base, 17, 18, 19), // d=3, bits within one block
      20L -> 0x7777000011112222L     // far (hamming >> 3)
    ).toDF("id", "sig")
    // -1 exercises the auto-size path (tiny corpus resolves to 4 blocks)
    for (blocks <- Seq(4, 6, -1)) {
      val pairs = DedupOps.simhashNearDupsFromSigs(sigs,
          maxDist = 3, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (b <- Seq(11L, 12L, 13L, 14L))
        assert(pairs.contains((10L, b)), s"blocks=$blocks missed pair 10-$b")
      assert(!pairs.exists { case (a, b) => a == 20L || b == 20L },
        s"blocks=$blocks produced a false ≤3 pair with the far doc")
    }
  }

  test("simhashBlocksFor widens the key space as the corpus grows") {
    assert(DedupOps.simhashBlocksFor(100L) === 4) // 16-bit keys suffice
    assert(DedupOps.simhashBlocksFor(100000000L) >= 6) // 10⁸ needs wider keys
    assert(DedupOps.simhashBlocksFor(2000000000L) <= 8) // capped at 8 blocks
    // monotone: more docs never narrows the key
    val ns = Seq(1L, 1000L, 1000000L, 1000000000L, 100000000000L)
    val bs = ns.map(DedupOps.simhashBlocksFor(_))
    assert(bs === bs.sorted)
    // large maxDist floors at maxDist+1 — always a valid banding config
    assert(DedupOps.simhashBlocksFor(1000L, maxDist = 8) === 9)
    val wide = Seq(1L -> 0L, 2L -> 255L).toDF("id", "sig") // hamming 8
    assert(DedupOps.simhashNearDupsFromSigs(wide, maxDist = 8, blocks = -1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("banding guarantee holds on random signatures at every block config") {
    // property sweep: 120 random (base, ≤maxDist-flipped) pairs per config
    // — every planted pair MUST surface (the pigeonhole guarantee is
    // absolute, not probabilistic), at the classic and both wide configs
    val rnd = new scala.util.Random(42)
    for (blocks <- Seq(4, 6, 8)) {
      val rows = (0 until 120).flatMap { i =>
        val base = rnd.nextLong()
        val d = 1 + rnd.nextInt(3)
        val bits = rnd.shuffle((0 until 64).toList).take(d)
        val flipped = bits.foldLeft(base)((s, b) => s ^ (1L << b))
        Seq((2L * i, base), (2L * i + 1, flipped))
      }
      val pairs = DedupOps.simhashNearDupsFromSigs(
          rows.toDF("id", "sig"), maxDist = 3, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val missed = (0 until 120).filter(i => !pairs.contains((2L * i, 2L * i + 1)))
      assert(missed.isEmpty,
        s"blocks=$blocks missed planted pairs at indices $missed")
    }
  }

  test("jaccard hot-block guard skips oversized blocks, keeps small ones") {
    val boiler = (1 to 20).map(_ => "same boilerplate words repeated here often").mkString(" ")
    val flood = (100L until 200L).map(i => (i, boiler, "xx", "s9"))
      .toDF("doc_id", "text", "lang", "source")
    val all = docs.union(flood)
    val pairs = DedupOps.jaccardNearDups(all, "doc_id", "text",
        Seq("lang", "source"), k = 3, threshold = 0.5, maxBlock = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L))) // small block intact
    assert(!pairs.exists { case (a, b) => a >= 100L || b >= 100L },
      "oversized block leaked pairs past the cap")
  }

  test("jaccard maxBlock without blockCols is rejected, not silently ignored") {
    // with no blocking keys there is no block to cap — the old behavior ran
    // the whole-corpus self-join unguarded while the caller believed the
    // quadratic term was bounded
    intercept[IllegalArgumentException] {
      DedupOps.jaccardNearDups(docs, "doc_id", "text", Seq.empty,
        k = 3, threshold = 0.5, maxBlock = 50)
    }
  }

  test("hot-bucket cap adds no extra shuffle to the band self-join") {
    // with broadcast disabled (the at-scale shape), the capped pipeline
    // should show exactly: one hashpartitioning exchange per join side on
    // (band, bucket) — shared by the windowed count and the join — plus
    // one for the cross-band pair dedup. A 4th exchange would mean the
    // cap introduced its own shuffle.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = DedupOps.simhashNearDups(docs, "doc_id", "text", maxDist = 3,
        maxBucket = 1000) // cap opted in: this test asserts the CAPPED plan
      pairs.count()
      val plan = pairs.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 3,
        s"capped band join gained a shuffle ($exchanges exchanges):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("shingles produce k-grams with set semantics") {
    val sh = docs.filter($"doc_id" === 1L)
      .select(DedupOps.shingles(col("text"), 3).as("sh"))
      .collect().head.getSeq[String](0)
    assert(sh.contains("the quick brown"))
    assert(sh.contains("quick brown fox"))
    // 15 words -> 13 trigrams, minus dups ("the" appears 3x but trigrams distinct)
    assert(sh.length === 13)
  }
}
