package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Implementations live in [[Queries]] (Spark) / [[OracleSql]] (DuckDB). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full ingest pipeline over events.parquet (SURVEY §7.3): envelope decode
    * → flatten → schema inference/evolution → LWW upsert → per-type counts. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 / §7.4. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CRUD / engine semantics (reference surface)
    "q_point_lookup" -> Queries.qPointLookup,
    "q_scan_list" -> Queries.qScanList,
    "q_count" -> Queries.qCount,
    "q_delete_anti" -> Queries.qDeleteAnti,
    "q_upsert_lww" -> Queries.qUpsertLww,
    "q_patch_merge" -> Queries.qPatchMerge,
    "q_flatten_props" -> Queries.qFlattenProps,
    "q_required_filter" -> Queries.qRequiredFilter,
    "q_null_strip" -> Queries.qNullStrip,
    "q_cast_coerce" -> Queries.qCastCoerce,
    "q_schema_union_evolve" -> Queries.qSchemaUnionEvolve,
    "q_engine_ingest" -> Queries.qEngineIngest,
    "q_engine_point_lookup" -> Queries.qEnginePointLookup,
    "q_engine_compact" -> Queries.qEngineCompact,
    "q_sink_roundtrip" -> Queries.qSinkRoundtrip,
    "q_zorder_scan" -> Queries.qZorderScan,
    "q_merge_into" -> Queries.qMergeInto,
    // projection / filter
    "q_project_filter" -> Queries.qProjectFilter,
    "q_pred_range_time" -> Queries.qPredRangeTime,
    // joins
    "q_join_inner_broadcast" -> Queries.qJoinInnerBroadcast,
    "q_join_sortmerge" -> Queries.qJoinSortmerge,
    "q_join_left" -> Queries.qJoinLeft,
    "q_join_full_outer" -> Queries.qJoinFullOuter,
    "q_join_bucketed" -> Queries.qJoinBucketed,
    "q_cogroup_stats" -> Queries.qCogroupStats,
    "q_join_semi" -> Queries.qJoinSemi,
    "q_bloom_semi" -> Queries.qBloomSemi,
    "q_join_anti" -> Queries.qJoinAnti,
    "q_join_theta_range" -> Queries.qJoinThetaRange,
    "q_join_asof" -> Queries.qJoinAsof,
    "q_join_interval_overlap" -> Queries.qJoinIntervalOverlap,
    "q_resample_ffill" -> Queries.qResampleFfill,
    // aggregation
    "q_agg_hash" -> Queries.qAggHash,
    "q_agg_distinct" -> Queries.qAggDistinct,
    "q_pivot" -> Queries.qPivot,
    "q_scalar_subquery" -> Queries.qScalarSubquery,
    "q_agg_collect_sorted" -> Queries.qAggCollectSorted,
    "q_win_ntile" -> Queries.qWinNtile,
    "q_agg_percentile" -> Queries.qAggPercentile,
    "q_agg_stats" -> Queries.qAggStats,
    "q_funnel" -> Queries.qFunnel,
    "q_retention_cohort" -> Queries.qRetentionCohort,
    "q_agg_approx_distinct" -> Queries.qAggApproxDistinct,
    "q_agg_minmax" -> Queries.qAggMinmax,
    "q_agg_argmax" -> Queries.qAggArgmax,
    "q_rollup" -> Queries.qRollup,
    "q_cube" -> Queries.qCube,
    "q_grouping_sets" -> Queries.qGroupingSets,
    "q_histogram" -> Queries.qHistogram,
    "q_profile_table" -> Queries.qProfileTable,
    "q_outliers_zscore" -> Queries.qOutliersZscore,
    "q_skew_salted_agg" -> Queries.qSkewSaltedAgg,
    "q_skew_salted_join" -> Queries.qSkewSaltedJoin,
    // window functions
    "q_win_rank_topk_per_group" -> Queries.qWinRankTopkPerGroup,
    "q_topk_udaf" -> Queries.qTopkUdaf,
    "q_win_lag_delta" -> Queries.qWinLagDelta,
    "q_win_frame_running_sum" -> Queries.qWinFrameRunningSum,
    "q_win_range_frame" -> Queries.qWinRangeFrame,
    "q_win_distribution" -> Queries.qWinDistribution,
    // sort / limit / set ops
    "q_topk_orderby_limit" -> Queries.qTopkOrderbyLimit,
    "q_union_all" -> Queries.qUnionAll,
    "q_union_distinct" -> Queries.qUnionDistinct,
    "q_intersect" -> Queries.qIntersect,
    "q_except" -> Queries.qExcept,
    // scalar functions
    "q_str_funcs" -> Queries.qStrFuncs,
    "q_date_trunc_bucket" -> Queries.qDateTruncBucket,
    "q_math_funcs" -> Queries.qMathFuncs,
    "q_array_funcs" -> Queries.qArrayFuncs,
    "q_hof_funcs" -> Queries.qHofFuncs,
    "q_explode_lateral" -> Queries.qExplodeLateral,
    "q_json_get" -> Queries.qJsonGet,
    "q_map_funcs" -> Queries.qMapFuncs,
    "q_date_cond_funcs" -> Queries.qDateCondFuncs,
    // streaming-equivalent event-time windows
    "q_window_tumbling" -> Queries.qWindowTumbling,
    "q_window_sliding" -> Queries.qWindowSliding,
    "q_session_window" -> Queries.qSessionWindow,
    "q_session_islands" -> Queries.qSessionIslands,
    "q_dedup_exact" -> Queries.qDedupExact,
    "q_stream_tumbling" -> Queries.qStreamTumbling,
    "q_stream_dedup" -> Queries.qStreamDedup,
    "q_stream_dedup_watermark" -> Queries.qStreamDedupWatermark,
    "q_stream_dedup_cluster" -> Queries.qStreamDedupCluster,
    "q_stream_lww" -> Queries.qStreamLww,
    "q_stream_session" -> Queries.qStreamSession,
    "q_stream_engine_ingest" -> Queries.qStreamEngineIngest,
    "q_scd2_history" -> Queries.qScd2History,
    // text analysis extensions
    "q_text_wordcount" -> Queries.qTextWordcount,
    "q_text_quality" -> Queries.qTextQuality,
    "q_text_token_count" -> Queries.qTextTokenCount,
    "q_text_fingerprint" -> Queries.qTextFingerprint,
    "q_text_jaccard_neardup" -> Queries.qTextJaccardNeardup,
    "q_text_langid" -> Queries.qTextLangid,
    "q_langid_eval" -> Queries.qLangidEval,
    "q_corpus_report" -> Queries.qCorpusReport,
    "q_unpivot" -> Queries.qUnpivot,
    "q_text_normalize" -> Queries.qTextNormalize,
    "q_text_editdist" -> Queries.qTextEditDist,
    "q_sample_hash" -> Queries.qSampleHash,
    "q_sample_weighted" -> Queries.qSampleWeighted,
    "q_sample_stratified" -> Queries.qSampleStratified,
    "q_pack_sequences" -> Queries.qPackSequences,
    "q_shuffle_deterministic" -> Queries.qShuffleDeterministic,
    "q_quality_filter" -> Queries.qQualityFilter,
    "q_text_ngrams" -> Queries.qTextNgrams,
    "q_text_tfidf" -> Queries.qTextTfidf,
    "q_bpe_merges" -> Queries.qBpeMerges,
    "q_inverted_index" -> Queries.qInvertedIndex,
    "q_decontaminate" -> Queries.qDecontaminate,
    "q_dedup_span" -> Queries.qDedupSpan,
    "q_gopher_quality" -> Queries.qGopherQuality,
    "q_sample_temperature" -> Queries.qSampleTemperature,
    "q_text_classifier" -> Queries.qTextClassifier,
    "q_chunk_tokens" -> Queries.qChunkTokens,
    "q_pii_redact" -> Queries.qPiiRedact,
    // dedup + similarity extensions
    "q_dedup_minhash_lsh" -> Queries.qDedupMinhashLsh,
    "q_dedup_simhash" -> Queries.qDedupSimhash,
    "q_dedup_cluster" -> Queries.qDedupCluster,
    "q_graph_pagerank" -> Queries.qGraphPagerank,
    "q_vec_cosine_topk" -> Queries.qVecCosineTopk,
    "q_vec_normalize" -> Queries.qVecNormalize,
    "q_sql_native_funcs" -> Queries.qSqlNativeFuncs,
    "q_vec_centroids" -> Queries.qVecCentroids,
    "q_vec_ann_lsh" -> Queries.qVecAnnLsh,
    "q_vec_ann_ivf" -> Queries.qVecAnnIvf,
    "q_vec_ann_pq" -> Queries.qVecAnnPq,
    "q_vec_ann_ivfpq" -> Queries.qVecAnnIvfPq,
    "q_dedup_embedding" -> Queries.qDedupEmbedding,
    "q_dedup_embedding_exact" -> Queries.qDedupEmbeddingExact,
    "q_dedup_embedding_cluster" -> Queries.qDedupEmbeddingCluster,
    "q_multimodal_decode" -> Queries.qMultimodalDecode,
    "q_multimodal_meta" -> Queries.qMultimodalMeta,
    "q_multimodal_frames" -> Queries.qMultimodalFrames,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (hash-based
    * sketches, approximate ANN/dedup, stubbed multimodal decode)
    * → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
