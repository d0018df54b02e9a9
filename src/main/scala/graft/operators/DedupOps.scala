package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale notes (the whole point of this module): pairwise similarity is
  * O(n²) and dies at corpus scale, so every near-dup path here goes through
  * a CANDIDATE GENERATION step whose output is linear-ish:
  *  - exact: one hash-agg on a digest (map-side combined);
  *  - Jaccard: deterministic blocking keys bound the pair space;
  *  - MinHash+LSH: band buckets → self-join only within buckets;
  *  - SimHash: 64-bit signature, candidates share a band of the signature.
  * All signatures use Spark's codegen'd xxhash64/hash — no UDFs.
  */
object DedupOps {

  /** Exact dedup via content digest: deterministic keeper = min(id). */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles of a text column (distinct, order-insensitive set). */
  def shingles(text: Column, k: Int): Column =
    array_distinct(TextOps.ngrams(text, k))

  /** Jaccard similarity of two token-set columns (exact, set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Exact n-gram Jaccard near-dup pairs within deterministic blocks.
    * `blockCols` bound the quadratic pair space (e.g. lang+source); emits
    * (idA < idB, jaccard ≥ threshold).
    *
    * `maxBlock` is the hot-block guard (the [[capHotBuckets]] analog for
    * caller-chosen blocking keys): any block larger than the cap is
    * skipped entirely before the self-join can materialize its O(block²)
    * pairs. The default keeps every block — exact-within-blocks is this
    * operator's contract — but at corpus scale pick blocks fine enough to
    * bound the quadratic term and set the cap as the backstop; past that
    * regime, [[minhashLshNearDups]] is the scale path.
    *
    * Shingles are compared as xxhash64 values, not strings: set sizes are
    * identical as long as the hash is injective on the observed shingle
    * universe (collision odds ~|shingles|²/2⁶⁴ ≈ 1e-8 here; verified
    * collision-free on the test corpus), and long-array intersection is
    * several× cheaper than string-array intersection over the O(block²)
    * pair space. */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                      blockCols: Seq[String], k: Int,
                      threshold: Double,
                      maxBlock: Int = Int.MaxValue): DataFrame = {
    // a cap without blocking keys would be a silent no-op: there is no
    // block to count, so the unblocked self-join would run fully unguarded
    // while the caller believes the quadratic term is bounded
    require(blockCols.nonEmpty || maxBlock == Int.MaxValue,
      "maxBlock requires blockCols: with no blocking keys there is no block" +
        " to cap — the whole corpus self-joins")
    // localCheckpoint for the same reason as minhash below: the self-join
    // would otherwise evaluate the shingle pipeline on BOTH sides
    val withSh0 = docs.select(
      (col(idCol).as("id") +: blockCols.map(c => col(c))) :+
        array_sort(array_distinct(
          transform(shingles(col(textCol), k), s => xxhash64(s)))).as("sh"): _*)
      .localCheckpoint()
    val withSh =
      if (maxBlock == Int.MaxValue || blockCols.isEmpty) withSh0
      else withSh0
        .withColumn("_bn", count(lit(1))
          .over(Window.partitionBy(blockCols.map(col): _*)))
        .filter(col("_bn") <= maxBlock)
        .drop("_bn")
    val a = withSh.alias("a")
    val b = withSh.alias("b")
    val blockCond = blockCols.map(c => col(s"a.`$c`") === col(s"b.`$c`"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, blockCond && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.plans.SortedIntersect.jaccardSorted(col("a.sh"), col("b.sh")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Candidate pairs from a shared blocking key WITHOUT a self-join: ids
    * sharing a key value (group size within [minN, maxN]) yield all
    * within-group (id_a < id_b) pairs, emitted by exploding per-key sorted
    * id arrays. Two shuffles total — the key window/agg (exchange reused
    * between the count prefilter and the collect, same partitioning) and
    * the cross-key pair distinct — vs 4-5 for the groupBy+join+self-join
    * formulation. The count prefilter runs BEFORE any array is collected,
    * so a boilerplate key shared by 10⁶ docs costs its count, never a
    * 10⁶-element array or a 10¹²-pair bucket.
    *
    * Input contract: (key, id) rows must be distinct — the prefilter counts
    * ROWS per key (a windowed count-distinct isn't available), so duplicate
    * rows would inflate group sizes past maxN. Dedupe upstream. */
  def keyedPairs(df: DataFrame, keyCol: String, idCol: String,
                 minN: Int, maxN: Int): DataFrame = {
    df.select(col(keyCol).as("_k"), col(idCol).as("_id"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("_k")))
      .filter(col("_n").between(minN, maxN))
      .groupBy("_k").agg(sort_array(collect_set(col("_id"))).as("_ids"))
      .select(explode(flatten(transform(col("_ids"), (a, i) =>
        transform(slice(col("_ids"), i + 2, lit(maxN)),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("_p"))
      .select(col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"))
      .distinct()
  }

  /** Hot-bucket guard for the banded self-joins: every (band, bucket) cell
    * with more than `maxBucket` members is dropped BEFORE the join can
    * materialize its pairs. A degenerate population — thousands of empty or
    * near-identical docs collapsing to one signature — otherwise turns a
    * single bucket quadratic (10⁶ members ⇒ 10¹² candidate pairs) at data
    * scale; mass-identical docs are [[exact]] dedup's job, not the near-dup
    * pair stream's. Same count-prefilter shape as [[keyedPairs]]: the
    * windowed count partitions on exactly the join keys, so the exchange is
    * computed once and reused by the join itself. */
  private[operators] def capHotBuckets(banded: DataFrame,
                                       maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) banded // uncapped: skip the count pass
    else banded
      // windowed count, NOT a broadcast blacklist: the window partitions
      // on exactly the self-join keys, so its exchange is REUSED by the
      // join (DedupOpsSpec asserts zero extra exchanges); a blacklist
      // anti-join would add an agg shuffle + broadcast build per plan.
      // (knnGraphLsh measured the opposite on ITS shape — see there.)
      .withColumn("_bn", count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("_bn") <= maxBucket)
      .drop("_bn")

  /** MinHash + LSH banding near-dup candidates: signatures are cut into
    * `bands` bands of `rowsPerBand`; docs sharing any band land in the same
    * bucket; candidate pairs are verified with exact Jaccard on (hashed)
    * shingles. The only shuffle is the bucket self-join — linear in bucket
    * sizes, with [[capHotBuckets]] bounding the worst cell at `maxBucket`.
    *
    * `maxBucket` is OPT-IN (default keeps every bucket): the cap DROPS a
    * whole (band, bucket) cell, so every pair touching it — including >cap
    * legitimately-near docs sharing a band — silently disappears from the
    * output. Set it (declared queries use 1000) when degenerate
    * mass-duplicates would otherwise go quadratic, and run [[exact]] dedup
    * first so identical docs never reach the banded join at all.
    *
    * The signature frame is locally checkpointed: the self-join would
    * otherwise evaluate the whole shingle+minhash pipeline on BOTH sides
    * (2× the dominant cost) — at cluster scale one materializes signatures
    * for the same reason. */
  def minhashLshNearDups(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                         threshold: Double = 0.7,
                         maxBucket: Int = Int.MaxValue): DataFrame = {
    val numHashes = bands * rowsPerBand
    // fused signature kernel: all k minima in one pass over the shingle
    // hashes (graft.plans.MinHashSignatures) — the k-lambda built-in
    // formulation materializes k intermediate arrays per document.
    // NO Par.fanOut here (r22 A/B): the fused native kernel is cheap
    // enough that shuffling the full text bodies to parallelize it
    // measured SLOWER (0.470 → 0.543 s on q_dedup_minhash_prod)
    val sigd = docs.select(col(idCol).as("id"),
        array_sort(array_distinct(
          transform(shingles(col(textCol), k), s => xxhash64(s)))).as("sh"))
      .withColumn("sig", graft.plans.MinHash.signatures(col("sh"), numHashes))
      .localCheckpoint()
    val banded = sigd.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(array_join(transform(
          sequence(b * rowsPerBand + 1, (b + 1) * rowsPerBand),
          i => element_at(col("sig"), i).cast(StringType)), ",")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val capped = capHotBuckets(banded, maxBucket)
    val a = capped.alias("a")
    val b = capped.alias("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b") // same pair may share several bands
      .withColumn("jac",
        graft.plans.SortedIntersect.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** The prime field of the fixed (oracle-replayable) MinHash family:
    * p = 2³¹−1, so affine-map products stay under 2⁶² — exact BIGINT
    * arithmetic in ANSI SQL and in Spark alike. */
  val MinhashFixedP = 2147483647L

  /** Fixed-seed affine-permutation coefficients over GF(p):
    * h_s(x) = (a_s·x + b_s) mod p, a_s ∈ [1, p−1], b_s ∈ [0, p−1] — the
    * universal-hash family of the classic MinHash construction (Broder
    * 1997), with the PRNG seed pinned so the DuckDB oracle can embed the
    * same coefficients as literals (the [[VectorOps.planes]] precedent). */
  def minhashFixedCoeffs(n: Int): Seq[(Long, Long)] = {
    val rnd = new java.util.Random(20240814L)
    Seq.fill(n)((1L + rnd.nextInt((MinhashFixedP - 1).toInt).toLong,
      rnd.nextInt(MinhashFixedP.toInt).toLong))
  }

  /** 31-bit polynomial code-point hash of a string column —
    * h = fold(31·acc + codePoint) mod p, the replayable stand-in for
    * xxhash64 in the FIXED minhash variant. ASCII contract: Spark's
    * `ascii` and SQL `unicode` agree on single-byte code points; callers
    * gate non-ASCII rows out on BOTH engines (the declared query filters
    * `[ -~]*`). Empty string hashes to 0 (guarded: Spark's
    * sequence(1, 0) is DESCENDING, not empty). */
  private def polyHash31(s: Column): Column =
    when(length(s) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(s)),
          i => ascii(s.substr(i, lit(1))).cast(LongType)),
        lit(0L), (acc, c) => (acc * 31L + c) % MinhashFixedP))

  /** [[minhashLshNearDups]] with every hash on an ORACLE-SHARED family —
    * the [[graft.operators.VectorOps.cosineTopKLshFixed]] treatment for
    * MinHash: shingle codes are the 31-bit polynomial hash, the k-min
    * signatures come from fixed-seed affine permutations over GF(2³¹−1)
    * ([[minhashFixedCoeffs]]), and a band's bucket key is the literal
    * comma-joined signature slice (no engine-specific hash anywhere).
    * Same banding, same hot-bucket cap, same exact-Jaccard verify as the
    * production path — so the WHOLE near-dup algorithm (signatures, band
    * buckets, candidate join, verify) can be replayed by the DuckDB
    * oracle and the candidate-pair set itself is a cross-engine-gated
    * fact (q_dedup_minhash_fixed). The production xxhash64 variant stays
    * the throughput path (its fused one-pass kernel beats 32 interpreted
    * HOF transforms); this one exists to put the algorithm under the
    * hash gate on a bounded slice. */
  /** The (id, sh, sig) signature frame of the FIXED minhash family —
    * public so DedupOpsSpec can driver-twin the exact arithmetic the
    * DuckDB oracle replays. */
  def minhashFixedSignatures(docs: DataFrame, idCol: String, textCol: String,
                             k: Int, numHashes: Int): DataFrame = {
    val coeffs = minhashFixedCoeffs(numHashes)
    docs.select(col(idCol).as("id"),
        array_sort(array_distinct(
          transform(shingles(col(textCol), k), s => polyHash31(s)))).as("sh"))
      .withColumn("sig", array(coeffs.map { case (a, b) =>
        coalesce(array_min(transform(col("sh"),
          x => (x * a + b) % MinhashFixedP)), lit(-1L)) }: _*))
  }

  def minhashLshNearDupsFixed(docs: DataFrame, idCol: String, textCol: String,
                              k: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                              threshold: Double = 0.5,
                              maxBucket: Int = Int.MaxValue): DataFrame =
    minhashFixedPairsFromSigs(
      // NO Par.fanOut here (r22 A/B): q_pipeline_pretrain feeds this an
      // ALREADY-distributed post-join frame, where the text re-shuffle
      // measured a consistent −25% (0.81 → 1.01 s); on the raw-scan
      // consumer (q_dedup_minhash_fixed) the fan-out read +6%, inside the
      // filtered-draw noise band — not worth the post-join consumer's loss
      minhashFixedSignatures(docs, idCol, textCol, k, bands * rowsPerBand)
        .localCheckpoint(), // two-sided self-join; same reuse as the prod path
      bands, rowsPerBand, threshold, maxBucket)

  /** Banding + hot-bucket cap + candidate join + exact-Jaccard verify of
    * the FIXED family, from an already-materialized `(id, sh, sig)`
    * signature frame — split out so the STREAMING index maintenance
    * ([[graft.streaming.Declared.minhashIndexMaintain]]) can fold
    * signatures incrementally per micro-batch and run the identical
    * candidate stage over the standing index at rest. Callers pass a
    * materialized frame (localCheckpoint or a parquet state read): the
    * self-join reads both sides. */
  def minhashFixedPairsFromSigs(sigd: DataFrame, bands: Int, rowsPerBand: Int,
                                threshold: Double,
                                maxBucket: Int): DataFrame = {
    val banded = sigd.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => array_join(transform(
          sequence(b * rowsPerBand + 1, (b + 1) * rowsPerBand),
          i => element_at(col("sig"), i).cast(StringType)), ","))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val capped = capHotBuckets(banded, maxBucket)
    val a = capped.alias("a")
    val b = capped.alias("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jac", size(array_intersect(col("sh_a"), col("sh_b")))
        .cast(DoubleType) / size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** Bit width of the FIXED SimHash family: 62 keeps the signature (and
    * every 2^b term in its construction) strictly positive in BIGINT on
    * both engines — no sign-bit/overflow edge to reason about. */
  val SimhashFixedBits = 62

  /** Fixed-seed affine coefficients deriving the FIXED SimHash bit
    * functions: bit_b(x) = [((a_b·x + b_b) mod p) ≥ 2³⁰] over the 31-bit
    * polynomial token code — a universal-hash bit family, PRNG-pinned so
    * the DuckDB oracle embeds the same coefficients as literals (the
    * [[minhashFixedCoeffs]] precedent; distinct seed). */
  def simhashFixedCoeffs(): (Seq[Long], Seq[Long]) = {
    val rnd = new java.util.Random(20250814L)
    val pairs = Seq.fill(SimhashFixedBits)(
      (1L + rnd.nextInt((MinhashFixedP - 1).toInt).toLong,
        rnd.nextInt(MinhashFixedP.toInt).toLong))
    (pairs.map(_._1), pairs.map(_._2))
  }

  /** FIXED-family SimHash signatures — the [[minhashFixedSignatures]]
    * treatment for SimHash: distinct space-split tokens (the
    * [[graft.plans.SimHash64]] tokenization), 31-bit polynomial token
    * codes, 62 affine-derived bit votes, bit set iff votes > 0 (the
    * production kernel's strict tie rule). Every step is exact BIGINT
    * arithmetic replayable in ANSI SQL; the production kernel stays the
    * throughput path (one fused XXH64 pass vs 62 interpreted bit-hashes).
    * ASCII contract as in [[minhashLshNearDupsFixed]]. */
  def simhashFixedSignatures(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val (as, bs) = simhashFixedCoeffs()
    val aLit = typedlit(as)
    val bLit = typedlit(bs)
    val pow2 = typedlit((0 until SimhashFixedBits).map(b => 1L << b))
    val codes = transform(array_distinct(split(col(textCol), " ", -1)),
      w => polyHash31(w))
    val votes = aggregate(codes,
      array_repeat(lit(0L), SimhashFixedBits),
      (acc, x) => zip_with(acc,
        transform(sequence(lit(0), lit(SimhashFixedBits - 1)), b =>
          when((x * element_at(aLit, b + 1) + element_at(bLit, b + 1))
            % MinhashFixedP >= 1073741824L, lit(1L)).otherwise(lit(-1L))),
        (u, v) => u + v))
    val sig = aggregate(
      zip_with(votes, pow2, (v, p2) => when(v > 0, p2).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
    docs.select(col(idCol).as("id"), sig.as("sig"))
  }

  /** [[simhashNearDups]] on the FIXED family: fixed signatures through the
    * SAME Manku block banding, hot-bucket cap, and exact-Hamming verify
    * ([[simhashNearDupsFromSigs]], blocks = 4) — so the whole SimHash
    * near-dup algorithm (signature bits, block keys, candidate join,
    * Hamming verify) is replayable by the generated DuckDB oracle and the
    * verified pair set is a cross-engine-gated fact
    * (q_dedup_simhash_fixed). */
  def simhashNearDupsFixed(docs: DataFrame, idCol: String, textCol: String,
                           maxDist: Int = 3,
                           maxBucket: Int = Int.MaxValue): DataFrame =
    simhashNearDupsFromSigs(
      // NO Par.fanOut here (r22 A/B): shuffling full text bodies to
      // parallelize the signature kernel measured SLOWER
      // (0.543 → 0.656 s on q_dedup_simhash_fixed)
      simhashFixedSignatures(docs, idCol, textCol).localCheckpoint(),
      maxDist, blocks = 4, maxBucket = maxBucket)

  /** Per-document 64-bit SimHash signatures through the native
    * [[graft.plans.SimHash64]] kernel: distinct tokens hashed once (XXH64
    * seed 42, bit-identical to `xxhash64`), all 64 bit-votes in one
    * per-row pass — a pure projection, NO shuffle (the explode +
    * 64-conditional-sum hash aggregate it replaces shuffled every token).
    * At corpus scale the signature is computed inside the scan stage and
    * only the 8-byte sig travels. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.plans.TextExpressions.simhash64(col(textCol)).as("sig"))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Block-combination SimHash band keys (the permuted-table construction
    * of Manku, Jain & Das Sarma, WWW 2007): the 64-bit signature is split
    * into `blocks` contiguous blocks and ONE band is emitted per
    * (blocks − maxDist)-subset of blocks, keyed on the concatenation of
    * that subset's bits. A pair at Hamming distance ≤ maxDist flips bits in
    * at most maxDist blocks, so the subset made of untouched blocks is one
    * of the enumerated bands — the pair is GUARANTEED to share a band key.
    *
    * `blocks = maxDist + 1` is the classic contiguous banding (for
    * maxDist=3: 4 tables keyed on 16 bits — bucket space 65,536/band, fine
    * to ~10⁷ docs). Raising `blocks` widens the key — blocks=6 ⇒ C(6,3)=20
    * bands on ~32-bit keys (~10⁹ docs), blocks=8 ⇒ C(8,3)=56 bands on
    * ~40-bit keys — trading band count (CPU + shuffle width, linear) for
    * bucket-collision mass (quadratic). [[simhashBlocksFor]] picks the
    * smallest config whose key space keeps expected bucket size ~1. */
  private[operators] def simhashBandKeys(sig: Column, blocks: Int,
                                         maxDist: Int): Seq[Column] = {
    require(maxDist >= 1 && blocks > maxDist && blocks <= 16,
      s"need 1 <= maxDist < blocks <= 16, got maxDist=$maxDist blocks=$blocks")
    val base = 64 / blocks
    val rem = 64 % blocks
    val widths = (0 until blocks).map(i => base + (if (i < rem) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def block(i: Int): Column =
      shiftrightunsigned(sig, offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1))
    (0 until blocks).combinations(blocks - maxDist).toSeq.map { subset =>
      subset.foldLeft(lit(0L): Column) { (k, b) =>
        shiftleft(k, widths(b)).bitwiseOR(block(b))
      }
    }
  }

  /** Smallest `blocks` whose per-band key space keeps expected bucket size
    * bounded for an `n`-doc corpus: key width ≈ 64·(blocks−maxDist)/blocks
    * must cover log₂(n) plus ~8 bits of headroom. Capped at
    * max(8, maxDist+1) blocks (8 ⇒ C(8,3)=56 bands, ~40-bit keys — the
    * Manku web-scale operating point; large maxDist floors at maxDist+1 so
    * the result is always a valid [[simhashBandKeys]] config); past the
    * cap, hot buckets are [[capHotBuckets]]'s job. */
  def simhashBlocksFor(n: Long, maxDist: Int = 3): Int = {
    require(maxDist >= 1 && maxDist < 16, s"need 1 <= maxDist < 16, got $maxDist")
    val need = math.log(math.max(n, 1L).toDouble) / math.log(2.0) + 8.0
    val hi = math.max(8, maxDist + 1)
    (maxDist + 1 to hi).find(m => 64.0 * (m - maxDist) / m >= need).getOrElse(hi)
  }

  /** SimHash near-dup candidates over pre-computed (id, sig) signatures:
    * band on [[simhashBandKeys]] (any ≤ maxDist pair shares a band), cap
    * hot buckets, verify candidates by exact Hamming distance.
    * `blocks <= 0` auto-sizes via [[simhashBlocksFor]] (one count over
    * `sigs` — pass a materialized frame), the [[graft.operators.VectorOps]]
    * `planesFor` analog. `maxBucket` is opt-in — see [[minhashLshNearDups]]
    * for what capping costs in recall. */
  def simhashNearDupsFromSigs(sigs: DataFrame, maxDist: Int = 3,
                              blocks: Int = 4,
                              maxBucket: Int = Int.MaxValue): DataFrame = {
    val m = if (blocks > 0) blocks else simhashBlocksFor(sigs.count(), maxDist)
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array(simhashBandKeys(col("sig"), m, maxDist): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val capped = capHotBuckets(banded, maxBucket)
    val a = capped.alias("a")
    val b = capped.alias("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** SimHash near-dup candidates from raw text: signature kernel →
    * [[simhashNearDupsFromSigs]]. `blocks = 4` is the classic 4×16-bit
    * banding; pass `blocks <= 0` to auto-size from the corpus count
    * (declared queries pin 4 for reproducibility). The signature frame is
    * locally checkpointed so the self-join doesn't recompute signatures on
    * both sides (and so the auto-size count is cheap). */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3, blocks: Int = 4,
                      maxBucket: Int = Int.MaxValue): DataFrame =
    simhashNearDupsFromSigs(
      // NO Par.fanOut (r22 A/B): the fused SimHash64 kernel is a pure
      // scan-side projection — shuffling text to widen it measured SLOWER
      // (0.649 → 0.860 s on q_dedup_simhash_prod)
      simhashSignatures(docs, idCol, textCol).localCheckpoint(),
      maxDist, blocks, maxBucket)
}
