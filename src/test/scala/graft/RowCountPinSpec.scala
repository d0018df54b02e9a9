package graft

/** Pinned row counts for every declared key WITHOUT a DuckDB oracle
  * (ADVICE r13 #2: the driver records only a spark-side row count for
  * these — "rows-only" — so nothing compared that count against an
  * expectation; a key silently returning a different-sized result would
  * still read as green). Each rows-only key's sf0.01 row count is
  * deterministic (seeded test data, deterministic algorithms), so it is
  * pinned here as an exact equality: a pipeline change that alters the
  * result SIZE of an un-oracled key now fails the suite instead of
  * passing unobserved. Content-level pins live with their operators
  * (BpeSpec pins q_bpe_encode's exact output; AnnRecallSpec floors the
  * ANN keys' recall; QueriesContractSpec bounds the HLL estimates).
  *
  * Keys converted to the hash gate drop off this list — the oracle is
  * strictly stronger. If a pin fails after an INTENTIONAL semantic
  * change, re-derive the count at sf0.01 and update it in the same
  * commit as the change, stating why.
  */
class RowCountPinSpec extends SparkSpec {

  private val pinned: Map[String, Long] = Map(
    "q_agg_approx_distinct" -> 3L,
    "q_agg_approx_percentile" -> 3L,
    "q_bpe_encode" -> 500L,
    "q_bpe_merges" -> 16L,
    "q_bpe_merges_floored" -> 16L,
    "q_dedup_minhash_prod" -> 25L,
    "q_dedup_simhash_prod" -> 1034L,
    "q_dsir_weights" -> 500L,
    "q_lm_perplexity" -> 500L,
    "q_multimodal_frames" -> 1234L,
    "q_text_bm25" -> 25L,
    "q_vec_ann_int8" -> 50L,
    "q_vec_ann_ivf" -> 50L,
    "q_vec_ann_ivfpq" -> 50L,
    "q_vec_ann_lsh_prod" -> 50L,
    "q_vec_ann_pq" -> 50L
  )

  test("every declared key without an oracle has a pinned row count") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unpinned = rowsOnly -- pinned.keySet
    assert(unpinned.isEmpty,
      s"rows-only keys without a pinned sf0.01 count: $unpinned — " +
        "add a pin here (or better, an oracle)")
    val stale = pinned.keySet -- rowsOnly
    assert(stale.isEmpty,
      s"pinned keys that now have an oracle (drop the pin): $stale")
  }

  pinned.toSeq.sortBy(_._1).foreach { case (key, expected) =>
    test(s"$key returns exactly $expected rows at sf0.01") {
      val n = SparkEntry.queries(key)(spark, sf("sf0.01")).count()
      assert(n === expected,
        s"$key row count drifted at sf0.01 (pinned $expected, got $n)")
    }
  }
}
