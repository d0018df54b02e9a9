package graft

/** Pinned sf0.01 row counts for every declared key WITHOUT a DuckDB oracle
  * (ADVICE r13 #2: the driver records only a spark-side row count for
  * these — "rows-only" — so nothing compared that count against an
  * expectation; a key silently returning a different-sized result would
  * still read as green). Each rows-only key's sf0.01 row count is
  * deterministic (seeded test data, deterministic algorithms), so it is
  * pinned here as an exact equality and enforced in two places:
  * RowCountPinSpec (suite) and tools/check_oracle.py via the
  * `expected_rows.json` that [[Verify]] writes next to `oracle_sql.json`
  * (local t2 gate) — a rows-only key is therefore never un-checked.
  *
  * Keys converted to the hash gate drop off this list — the oracle is
  * strictly stronger. If a pin fails after an INTENTIONAL semantic
  * change, re-derive the count at sf0.01 and update it in the same
  * commit as the change, stating why. Content-level pins live with their
  * operators (BpeSpec pins q_bpe_encode's exact output; AnnRecallSpec
  * floors the ANN keys' recall; QueriesContractSpec bounds the HLL
  * estimates).
  */
object RowCountPins {
  val pinned: Map[String, Long] = Map(
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
}
