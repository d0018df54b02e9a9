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
    * Shingles are compared as xxhash64 values, not strings: set sizes are
    * identical as long as the hash is injective on the observed shingle
    * universe (collision odds ~|shingles|²/2⁶⁴ ≈ 1e-8 here; verified
    * collision-free on the test corpus), and long-array intersection is
    * several× cheaper than string-array intersection over the O(block²)
    * pair space. */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                      blockCols: Seq[String], k: Int,
                      threshold: Double): DataFrame = {
    // localCheckpoint for the same reason as minhash below: the self-join
    // would otherwise evaluate the shingle pipeline on BOTH sides
    val withSh = docs.select(
      (col(idCol).as("id") +: blockCols.map(c => col(c))) :+
        array_sort(array_distinct(
          transform(shingles(col(textCol), k), s => xxhash64(s)))).as("sh"): _*)
      .localCheckpoint()
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

  /** MinHash + LSH banding near-dup candidates: signatures are cut into
    * `bands` bands of `rowsPerBand`; docs sharing any band land in the same
    * bucket; candidate pairs are verified with exact Jaccard on (hashed)
    * shingles. The only shuffle is the bucket self-join — linear in bucket
    * sizes.
    *
    * The signature frame is locally checkpointed: the self-join would
    * otherwise evaluate the whole shingle+minhash pipeline on BOTH sides
    * (2× the dominant cost) — at cluster scale one materializes signatures
    * for the same reason. */
  def minhashLshNearDups(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                         threshold: Double = 0.7): DataFrame = {
    val numHashes = bands * rowsPerBand
    // fused signature kernel: all k minima in one pass over the shingle
    // hashes (graft.plans.MinHashSignatures) — the k-lambda built-in
    // formulation materializes k intermediate arrays per document
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
    val a = banded.alias("a")
    val b = banded.alias("b")
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

  /** SimHash near-dup candidates: block on 16-bit signature bands (4 bands;
    * near-dups differing in ≤3 bits must share ≥1 band), verify by Hamming
    * distance ≤ maxDist. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    val sigd = simhashSignatures(docs, idCol, textCol).localCheckpoint()
    val banded = sigd.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
