package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pinned sf0.01 EXPECTATIONS for every declared key WITHOUT a DuckDB
  * oracle (the "rows-only" tail). Two layers, both enforced in the suite
  * (ResultPinSpec) and the local t2 gate ([[Verify]] exports →
  * tools/check_oracle.py):
  *
  *  1. `pinned` — exact sf0.01 row count (ADVICE r13 #2). Catches size
  *     regressions, but most of these counts are STRUCTURALLY INVARIANT
  *     (VERDICT r14 #2: the five ANN keys return k×queries = 50 rows by
  *     `row_number() <= k` construction regardless of WHICH neighbors are
  *     returned), so a ranking bug passes every count pin.
  *  2. `hashPinned` — a canonical Spark-side CONTENT hash of the whole
  *     sf0.01 result ([[canonicalHash]]; the BpeSpec exact-output pin
  *     generalized). Every rows-only key is deterministic (seeded data,
  *     fixed hash seeds, integer tie-breaks), so a silent wrong answer —
  *     one swapped neighbor, one drifted score — now FAILS the pin
  *     instead of passing unobserved.
  *
  * Keys converted to the DuckDB hash gate drop off both maps — the oracle
  * is strictly stronger. If a pin fails after an INTENTIONAL semantic
  * change, re-derive it at sf0.01 (graft.tools.PinHashes prints both) and
  * update it in the same commit as the change, stating why.
  */
object ResultPins {

  /** Canonical content hash of a result, computed DISTRIBUTED (no row
    * collect): columns sorted by name, each value rendered canonically
    * ([[renderCol]]), rows folded with an order-independent combiner —
    * `count` + the wrapping Long SUM of per-row xxhash64 — so the hash is
    * invariant to partitioning and task order while still catching
    * duplicate-row changes (a XOR fold would cancel identical pairs).
    *
    * Floats are rendered at 6 significant digits: every pinned pipeline
    * is deterministic per-row, but grouped float SUMS (perplexity,
    * DSIR log-ratios) can wobble at ~1e-15 relative under AQE's
    * merge-order freedom; 6 digits is far above that and far below any
    * real scoring regression. */
  def canonicalHash(df: DataFrame): String = {
    val cols = df.schema.fields.sortBy(_.name).map(f => renderCol(col(f.name), f.dataType))
    // column renderings join on U+001F (unit separator) so ("ab","c")
    // and ("a","bc") hash differently; written as an ESCAPE because the
    // raw byte is invisible — ADVICE r15 #2 misread it as no-separator,
    // the same unreviewable-control-char hazard as VERDICT r13 #6. The
    // byte cannot appear in a canonical rendering of the pinned keys
    // (numbers/hex/NULL markers/tokenized words).
    val rowStr = concat_ws("\u001f", cols.toIndexedSeq: _*)
    // sum as decimal(38,0) — a plain Long sum overflows under ANSI mode
    // after ~2 rows of worst-case hashes; 38 digits hold ~10^18 rows, and
    // the driver folds the exact sum back to 64 bits
    val agg = df.select(rowStr.as("r"))
      .agg(count(lit(1)).as("n"),
        sum(xxhash64(col("r")).cast(DecimalType(38, 0))).as("h"))
      .head()
    val n = agg.getLong(0)
    val h =
      if (agg.isNullAt(1)) 0L
      else agg.getDecimal(1).toBigInteger
        .mod(java.math.BigInteger.TWO.pow(64)).longValue()
    f"$n%d:$h%016x"
  }

  /** Canonical rendering of one column: NULL marker, fixed-precision
    * scientific floats, hex binary, recursively-rendered arrays; anything
    * unexpected fails fast rather than hashing an unstable rendering. */
  private def renderCol(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      coalesce(format_string("%.6e", c.cast(DoubleType)), lit("NULL"))
    case BinaryType => coalesce(hex(c), lit("NULL"))
    case ArrayType(et, _) =>
      coalesce(
        concat(lit("["),
          array_join(transform(c, x => renderElem(x, et)), ","), lit("]")),
        lit("NULL"))
    case _: StructType => coalesce(to_json(c), lit("NULL"))
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         StringType | DateType | TimestampType | _: DecimalType =>
      coalesce(c.cast(StringType), lit("NULL"))
    case other =>
      throw new IllegalArgumentException(
        s"canonicalHash: unsupported column type $other — add a canonical rendering")
  }

  private def renderElem(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      coalesce(format_string("%.6e", c.cast(DoubleType)), lit("NULL"))
    case BinaryType => coalesce(hex(c), lit("NULL"))
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         StringType =>
      coalesce(c.cast(StringType), lit("NULL"))
    case other =>
      throw new IllegalArgumentException(
        s"canonicalHash: unsupported array element type $other")
  }

  val pinned: Map[String, Long] = Map(
    "q_agg_approx_distinct" -> 3L,
    "q_agg_approx_percentile" -> 3L,
    "q_bpe_encode" -> 500L,
    "q_bpe_merges" -> 16L,
    "q_bpe_merges_floored" -> 16L,
    "q_dedup_minhash_prod" -> 25L,
    "q_dedup_simhash_prod" -> 1034L,
    "q_dsir_weights" -> 500L,
    // hybrid RRF rides the generated-oracle IVF replay since r18 (the
    // q_vec_ann_ivf precedent): oracle-gated in Verify, pin-covered in
    // the suite where the training context is absent
    "q_hybrid_rrf" -> 50L,
    // maintain-then-serve twin == batch q_hybrid_rrf, same pins
    "q_stream_hybrid" -> 50L,
    // RAG serving composition (hybrid -> MMR) — generated-oracle-gated in
    // Verify, pin-covered in the suite (the q_vec_ann_ivf precedent)
    "q_hybrid_mmr" -> 25L,
    "q_lm_perplexity" -> 500L,
    "q_text_bm25" -> 25L,
    // q_vec_ann_ivf keeps its pin although Verify's GENERATED oracle now
    // hash-gates it (OracleSql.generated): the oracle exists only under a
    // training context, so the suite still needs the pin to cover the key
    "q_vec_ann_ivf" -> 50L,
    "q_vec_ann_ivfpq" -> 50L,
    // persisted IVF-PQ index == computed q_vec_ann_ivfpq, same pins
    "q_vec_ann_ivfpq_indexed" -> 50L,
    "q_vec_ann_lsh_prod" -> 50L,
    "q_vec_ann_pq" -> 50L,
    // streaming fold == batch q_vec_ann_ivf by construction, same pins
    "q_stream_vec_ivf" -> 50L,
    // partition-pruned persisted index == batch q_vec_ann_ivf, same pins
    "q_vec_ann_ivf_indexed" -> 50L
  )

  /** sf0.01 canonical content hash per rows-only key (derive with
    * `sbt "runMain graft.tools.PinHashes"`; stability proven by identical
    * hashes at local[4] and local[8] — partition/merge-order independent,
    * including the sketch keys and the grouped-float-sum ln keys). */
  val hashPinned: Map[String, String] = Map(
    "q_agg_approx_distinct" -> "3:32d4447a77294c4e",
    "q_agg_approx_percentile" -> "3:dabffa4c514552da",
    "q_bpe_encode" -> "500:b2e63d7c74e63ea1",
    "q_bpe_merges" -> "16:0ea005163235b6e9",
    "q_bpe_merges_floored" -> "16:0ea005163235b6e9",
    "q_dedup_minhash_prod" -> "25:7af05ed74fa80e95",
    "q_dedup_simhash_prod" -> "1034:65c4de89929f8417",
    "q_dsir_weights" -> "500:a60fd25ec3948a06",
    "q_hybrid_mmr" -> "25:aee937ba3fb802c5",
    "q_hybrid_rrf" -> "50:d7be284412a92bce",
    // maintain-then-serve twin == batch q_hybrid_rrf: the SHARED pin is
    // the stream ≡ batch proof (the q_stream_vec_ivf precedent)
    "q_stream_hybrid" -> "50:d7be284412a92bce",
    "q_lm_perplexity" -> "500:097df3aa8322d987",
    "q_text_bm25" -> "25:9e0df9d2b1a7c1ef",
    "q_vec_ann_ivf" -> "50:5a80ee72f72e8934",
    // streaming fold == batch q_vec_ann_ivf by construction, same hash
    "q_stream_vec_ivf" -> "50:5a80ee72f72e8934",
    // partition-pruned persisted index == batch q_vec_ann_ivf, same hash
    "q_vec_ann_ivf_indexed" -> "50:5a80ee72f72e8934",
    "q_vec_ann_ivfpq" -> "50:ccf63940969f04f2",
    // persisted IVF-PQ index == computed q_vec_ann_ivfpq: the SHARED pin
    // is the indexed ≡ computed proof (the q_vec_ann_ivf_indexed precedent)
    "q_vec_ann_ivfpq_indexed" -> "50:ccf63940969f04f2",
    "q_vec_ann_lsh_prod" -> "50:b79cf4f85a89fd00",
    "q_vec_ann_pq" -> "50:0c8dcb6dd30f9ddc"
  )

  /** sf0.1 pins (VERDICT r17 #3): the sf0.01 pins above catch a kernel
    * regression only at the small SF; these extend the same row-count +
    * content-hash gate to the BENCH scale, so a scale-dependent wrong
    * answer (a cap binding differently, a skew path activating, an
    * overflow) is caught without the oracle. Derived with
    * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
    * graft.tools.PinHashes"`; stability proven by identical hashes at
    * local[4] and local[8]. Keys mirror the sf0.01 maps (every key that
    * is rows-only in SUITE context, where the generated oracles are
    * unavailable). */
  val pinnedSf10: Map[String, Long] = Map(
    "q_agg_approx_distinct" -> 3L,
    "q_agg_approx_percentile" -> 3L,
    "q_bpe_encode" -> 5000L,
    "q_bpe_merges" -> 16L,
    "q_bpe_merges_floored" -> 16L,
    "q_dedup_minhash_prod" -> 25L,
    "q_dedup_simhash_prod" -> 30855L,
    "q_dsir_weights" -> 5000L,
    "q_hybrid_mmr" -> 25L,
    "q_hybrid_rrf" -> 50L,
    "q_lm_perplexity" -> 5000L,
    "q_stream_hybrid" -> 50L,
    "q_stream_vec_ivf" -> 50L,
    "q_text_bm25" -> 25L,
    "q_vec_ann_ivf" -> 50L,
    "q_vec_ann_ivf_indexed" -> 50L,
    "q_vec_ann_ivfpq" -> 50L,
    "q_vec_ann_ivfpq_indexed" -> 50L,
    "q_vec_ann_lsh_prod" -> 50L,
    "q_vec_ann_pq" -> 50L
  )

  val hashPinnedSf10: Map[String, String] = Map(
    "q_agg_approx_distinct" -> "3:e4beab785f0300af",
    "q_agg_approx_percentile" -> "3:5926421cd81758bf",
    "q_bpe_encode" -> "5000:0fd1d40406fac821",
    "q_bpe_merges" -> "16:cd55bee9bda9dd0d",
    "q_bpe_merges_floored" -> "16:cd55bee9bda9dd0d",
    "q_dedup_minhash_prod" -> "25:f8e2ed0dd421b513",
    "q_dedup_simhash_prod" -> "30855:f6aeb60c2604d0be",
    "q_dsir_weights" -> "5000:1b94aa8f7a4df4fd",
    "q_hybrid_mmr" -> "25:55118a1213202923",
    "q_hybrid_rrf" -> "50:0c46166e8f742e03",
    "q_lm_perplexity" -> "5000:29648648c4577c0c",
    // maintain-then-serve twin == batch q_hybrid_rrf, same hash
    "q_stream_hybrid" -> "50:0c46166e8f742e03",
    // streaming fold == batch q_vec_ann_ivf == persisted index, same hash
    "q_stream_vec_ivf" -> "50:39a52bbe40637588",
    "q_text_bm25" -> "25:3ad061187bc2ee77",
    "q_vec_ann_ivf" -> "50:39a52bbe40637588",
    "q_vec_ann_ivf_indexed" -> "50:39a52bbe40637588",
    "q_vec_ann_ivfpq" -> "50:ac0ba9d6c570a596",
    // shared pin == the indexed ≡ computed proof at bench scale
    "q_vec_ann_ivfpq_indexed" -> "50:ac0ba9d6c570a596",
    "q_vec_ann_lsh_prod" -> "50:a8ad7efc971dfcfe",
    "q_vec_ann_pq" -> "50:a38e94e7ea499c21"
  )
}
