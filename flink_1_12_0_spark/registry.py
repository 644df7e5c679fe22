"""Query registry: the single source for ``queries()`` / ``oracle_sql()``.

Every operator we implement registers a named query (Spark side) plus an
equivalent DuckDB oracle SQL string.  The driver's correctness gate runs
both at sf=0.01 and hash-compares (columns sorted by name, numerics rounded
to 2 decimals) — so Spark aliases and oracle aliases MUST agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: extra query names bench.py should time beyond its core TPC-H set —
#: the LLM-pipeline and custom-operator tiers (dedup, similarity, as-of
#: join, CEP), so the bench tracks the scale paths, not just TPC-H.
BENCH_EXTRA: list[str] = [
    # custom-state streaming tier first: it measures ~2x slower when run
    # after the Python-heavy (mapInPandas) tier fills the session's worker
    # pool and heap — early position keeps its number comparable run-to-run
    "stream_continuous_fire",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "text_token_count",
    "join_asof_latest_view",
    "cep_errors_then_purchase",
    "flinksql_match_recognize",
    "sim_ann_ivf_kmeans",
    # TPC-DS-shape batch tier (window-over-aggregate reuse)
    "tpcds_yoy_growth",
    # end-to-end corpus-prep composition (quality+langid+dedup+rollup)
    "pipeline_pretrain_corpus",
    # sequence packing: the per-source window-cumsum bin assignment
    "text_pack_sequences",
    # round-3 append (BENCH_EXTRA is append-only for round-over-round
    # comparability): the temporal-join SQL surface
    "flinksql_temporal_asof",
    # round-3 continuation: corpus-management tier + the self-join
    # market-basket shape
    "text_tfidf_topk",
    "dedup_substring_chunks",
    "tpcds_market_basket",
    # round-3 late append: new paths added after the rotation — the
    # bigram LM gate and the merging-session stateful operator (streaming
    # tier, runs under the same warm-up).  dedup_semdedup_cells stays
    # un-benched by design: like sim_cosine_topk's brute-force arm it is
    # an exact-semantics baseline (O(N^1.5) balanced), with the LSH/IVF
    # variants as the benched scale paths.
    "text_bigram_xentropy",
    "stream_session_trigger_windows",
    # round-4 append: the two remaining un-benched custom-state families —
    # watermark-driven in-order emit and the sharded first-seen LSH dedup
    "stream_temporal_sort",
    "stream_lsh_dedup",
    # round-8 append: the constant-state Bloom decontamination path (one
    # corpus gram explode + broadcast bit-test join, pure JVM SQL)
    "decontam_bloom_filter",
    # round-9 append: the fourth sketch — bottom-k quantile summary
    # (TakeOrderedAndProject build, pure JVM SQL) — and the Bloom
    # runtime-filter join (shuffle-free fact-side probe, pure JVM)
    "sketch_quantiles_bottomk",
    "join_bloom_runtime_filter",
    # round-10 append: the learned quality classifier (broadcast weight
    # join + one per-doc sum) and the q72-shape inventory join (the
    # (part, week) co-partitioned rollup join with two residuals)
    "text_quality_classifier",
    "tpcds_inventory_week_offset",
    # round-11 append: IVFADC (the cell-restricted ADC composition — the
    # bucketed ANN scale path) and the q51 cumulative full-outer shape
    # (item-hash partitioning reused across agg, window, join, and both
    # running maxes)
    "sim_ann_recall_ivfadc",
    "tpcds_cumulative_channel_fullouter",
    # round-12 append: the composed retrieval stack (hybrid BM25+cosine
    # RRF fusion — one corpus explode + broadcast query vectors), the
    # JL random-projection recall receipt (stateless row-local projection
    # feeding the brute-force top-k shape), and the two-round PRF (both
    # BM25 rounds + expansion mining off ONE checkpointed tf table)
    "sim_hybrid_rrf",
    "sim_random_projection_recall",
    "text_bm25_prf",
    # round-13 append: the 3-arm RRF (lexical + semantic + JL-projected
    # cheap tier fused in one double-FULL-OUTER pass) and the inverted
    # standing-query route (term->queries broadcast artifact, Q=64,
    # stateless append-mode ingest scoring)
    "sim_hybrid_rrf3",
    "stream_bm25_route_inverted",
    # the composed alerting product: routed ingest -> Q x k typed-Arrow
    # standing rankings (streaming Top-N keyed by standing query)
    "stream_route_topn_standing",
    # the semantic twin: standing query VECTORS routed through the IVF
    # cell structure (cell -> queries inverted artifact, bounded by the
    # codebook not Q; per-row cost = one argmax + |watchers| cosines)
    "stream_semantic_route_cells",
    # round-14 append: weighted RRF (2:1:1 — same plan as rrf3, the
    # weight folds into the rank-list fuse) and the UPDATABLE routing
    # tier (runtime rule adds/removes via the broadcast-state control
    # stream; state = one live-set row per shard), its semantic twin,
    # and the large-vocabulary broadcast-table routing form
    "sim_hybrid_rrf3w",
    "stream_route_updatable",
    "stream_semantic_route_updatable",
    "stream_bm25_route_broadcast",
    # stream_route_topn_updatable stays un-benched by design: it is the
    # two benched stateful tiers (the rule gate above + the streaming
    # Top-N of stream_route_topn_standing) chained through a replayable
    # intermediate — benching it would time the same two operators plus
    # one parquet roundtrip (the dedup_semdedup_cells precedent)
    # round-15 append: the retention-safe broadcast route (foreachBatch
    # per-batch re-agg — ZERO streaming state vs the update-mode row's
    # corpus-proportional store; VERDICT r14 "What's wrong" #2) and the
    # runtime-add tier (foreachBatch-maintained artifact table re-read
    # per micro-batch — true processBroadcastElement adds; VERDICT r14
    # "What's missing" #2)
    "stream_bm25_route_retained",
    "stream_route_runtime_add",
    # the artifact-interval form of the full updatable contract: adds
    # AND removes as [lo, hi) rows in the broadcast table — zero
    # streaming state, no Python on the doc path (the direct plan
    # contrast to stream_route_updatable's keyed gate)
    "stream_route_updatable_artifact",
    # the semantic twin of runtime adds: standing query VECTORS
    # registered mid-stream through the cell -> (query, qv) artifact
    # table (registration = one 16-row codebook probe, no corpus scan)
    "stream_semantic_route_runtime_add",
    # stream_route_topn_runtime stays un-benched by design (the
    # stream_route_topn_updatable precedent): it is the benched
    # runtime-add route feeding the benched streaming Top-N through the
    # stage append — benching it would time the same two tiers again
    # round-16 append: the vector twin of the interval-artifact route
    # (closes the updatable matrix) and the kafka-transport control
    # stream (offset/partition machinery under the alerting tier)
    "stream_semantic_route_updatable_artifact",
    "stream_route_updatable_kafka",
    # stream_route_updatable_kafka_chunked (round 17) stays un-benched
    # by design: it is the benched kafka row's exact topology driven
    # through a 2-phase checkpoint restart with per-partition-chunk
    # consumption, so its wall time is ~5 stream (re)starts' worth of
    # availableNow floor around the same benched operators — a restart-
    # harness measurement, not an engine one (the
    # stream_route_topn_updatable precedent)
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle SQL.

    Queries with no oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: Every query name the driver graded green in ROUND 3
#: (CORRECTNESS_r03.json — 50 names, zero red).  Kept separate from the
#: rounds-1-2 set so each round's fold-in stays auditable.
GRADED_ROUND_3: frozenset[str] = frozenset({
    "cep_followed_by_any", "cep_group_pattern", "cep_or_until", "cep_timeout_abandoned",
    "dedup_cluster_components", "dedup_keep_first", "dedup_keep_last", "flinksql_lateral_udtf",
    "flinksql_statement_set", "flinksql_temporal_asof", "fn_bit_ops", "fn_time_type",
    "fn_url_map", "join_lookup_cached", "join_skew_salted", "join_temporal_versioned",
    "over_lead_lag", "over_range_frame", "over_rank_fns", "setop_except",
    "setop_intersect", "setop_intersect_all", "setop_union_all", "setop_union_distinct",
    "sort_limit_offset", "src_csv_roundtrip", "src_jdbc_roundtrip", "src_json_partitioned",
    "src_kafka_upsert_roundtrip", "src_orc_roundtrip", "src_partitioned_pruning", "stream_coprocess_control",
    "stream_count_slide_windows", "stream_count_windows", "stream_dedup_first", "stream_dedup_keep_last",
    "stream_hop_trigger_windows", "stream_interval_join", "stream_interval_join_outer", "stream_over_rows",
    "stream_over_time_range", "stream_sort_limit", "stream_window_join", "text_pack_sequences",
    "topn_per_group", "udf_price_bands", "values_inline", "window_hop",
    "window_session", "window_tumble",
})

#: Every query name the driver has already graded green (union of
#: CORRECTNESS_r01.json and CORRECTNESS_r02.json — 95 names, zero red).
#: The driver grades only the FIRST 50 entries of ``queries()`` each
#: round, so these rotate to the BACK: round 3's window goes entirely to
#: the 83 never-graded queries plus this round's new surface.
GRADED_ROUNDS_1_2: frozenset[str] = frozenset({
    "agg_basic", "agg_collect_listagg", "agg_cube", "agg_distinct_split",
    "agg_filtered", "agg_first_last_value", "agg_grouping_sets", "agg_multi_distinct",
    "agg_rollup", "agg_stats", "agg_sum0_empty", "calc_project_filter",
    "cdc_debezium_apply", "cdc_temporal_pipeline", "cep_errors_then_purchase",
    "cep_funnel_view_click_purchase", "cep_stream_errors_purchase",
    "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "flinksql_ddl_roundtrip", "flinksql_match_recognize",
    "flinksql_match_recognize_all_rows", "flinksql_match_recognize_quantified",
    "flinksql_match_recognize_reluctant", "flinksql_match_recognize_skip_nav",
    "flinksql_split_index_dialect", "flinksql_tumble_dialect", "fn_array_lambda",
    "fn_conditional", "fn_json", "fn_math", "fn_string_basic",
    "fn_string_encode_hash", "fn_string_regex_split", "fn_temporal",
    "join_asof_latest_view", "join_cross", "join_full_outer",
    "join_inner_broadcast", "join_left_anti", "join_left_outer", "join_left_semi",
    "join_multiway_star", "join_null_safe", "join_right_outer", "join_theta_band",
    "mm_decode_stats", "mm_feature_pipeline", "mm_frame_sample", "over_rows_frame",
    "setop_except_all", "sim_ann_ivf", "sim_ann_ivf_kmeans", "sim_ann_lsh_bucketed",
    "sim_cosine_topk", "sim_threshold_pairs", "stream_continuous_fire",
    "stream_count_evictor", "stream_delta_evictor", "stream_topn_per_user",
    "stream_tumble_agg", "tableapi_flat_aggregate", "text_fingerprint",
    "text_lang_id", "text_simhash", "text_stats", "text_token_count",
    "tpcds_cumulative_compare", "tpcds_having_count_band",
    "tpcds_rollup_rank_within_parent", "window_cumulate",
    *[f"tpch_q{i}" for i in range(1, 23)],
})

#: Every query name the driver graded green in ROUND 4
#: (CORRECTNESS_r04.json — 50 names, zero red; includes the
#: stream_coprocess_control regrade, now non-vacuous at 929 rows).
GRADED_ROUND_4: frozenset[str] = frozenset({
    "agg_approx_distinct", "agg_approx_percentile", "agg_percentiles", "cdc_canal_apply",
    "cdc_maxwell_apply", "cep_not_next", "dedup_lsh_recall", "dedup_substring_chunks",
    "distinct_project", "flinksql_computed_column", "flinksql_create_table_like", "join_interval_events",
    "mm_audio_energy", "mm_content_dedup", "pipeline_dedup_canonical", "pipeline_pretrain_corpus",
    "sample_split_assignment", "scalar_subquery_filter", "sim_ann_recall", "sim_quantized_cosine",
    "sort_nulls_ordering", "stream_coprocess_control", "stream_embedding_dedup", "stream_lsh_dedup",
    "stream_mm_content_dedup", "tableapi_revenue_by_nation", "text_chunking", "text_decontaminate",
    "text_domain_mix_weights", "text_pii_redact", "text_quality_gopher", "text_source_quota_sample",
    "text_tfidf_topk", "text_vocab_coverage", "text_word_entropy", "tpcds_channel_union",
    "tpcds_customer_set_ops", "tpcds_exists_not_exists", "tpcds_hour_ratio", "tpcds_item_class_share",
    "tpcds_market_basket", "tpcds_moving_avg_deviation", "tpcds_repeat_buyers", "tpcds_scalar_subquery_buckets",
    "tpcds_segment_outliers", "tpcds_yoy_growth", "unnest_explode", "unnest_posexplode",
    "window_session_dynamic_gap", "window_tumble_grouped_topn",
})

#: Every query name the driver graded green in ROUNDS 5+6
#: (CORRECTNESS_r05.json and r06.json graded the SAME 50-name window —
#: round 6 did not rotate; r06 is 50/50 green including the regraded
#: tpcds_frequent_items_spenders and the tpch_q7/q9/q21 regrades).
GRADED_ROUND_5_6: frozenset[str] = frozenset({
    "async_enrich_nations", "cep_skip_till_next", "cep_times_or_more_consecutive",
    "datastream_max_by", "dedup_exact_normalized", "dedup_semdedup_cells",
    "flinksql_dialect_extras", "flinksql_temporal_function",
    "fn_math_hyperbolic_truncate", "fn_temporal_calendar", "mm_resize_metadata",
    "mm_scene_cuts", "pipeline_streaming_corpus", "sim_ann_recall_ivf",
    "src_datagen_sequence", "src_kafka_raw_roundtrip", "src_kafka_startup_timestamp",
    "src_kafka_tombstones", "src_sink_not_null_drop", "stream_broadcast_rules",
    "stream_cumulate_agg", "stream_dedup_ttl", "stream_hop_agg",
    "stream_over_unbounded", "stream_session_agg", "stream_session_trigger_windows",
    "stream_side_outputs", "stream_static_join", "stream_temporal_sort",
    "text_bigram_xentropy", "text_dsir_weights", "text_ngram_novelty",
    "text_repetition_sentences", "text_unigram_xentropy",
    "tpcds_channel_profit_rollup", "tpcds_customer_channel_growth",
    "tpcds_dual_rank_returns", "tpcds_frequent_items_spenders",
    "tpcds_monthly_pivot", "tpcds_multi_band_counts", "tpcds_net_after_returns",
    "tpcds_repeat_item_purchases", "tpcds_revisit_within_90d",
    "tpcds_share_growth_streak", "tpcds_ship_latency_buckets",
    "tpcds_week_over_week", "tpch_q21", "tpch_q7", "tpch_q9",
    "udaf_weighted_avg",
})

#: Every query name the driver graded green in ROUND 8
#: (CORRECTNESS_r08.json — 50 names, zero red; the window was exactly
#: ``ordered_queries()[:50]`` = all 30 then-SUPERSEDED_GREENS regrades,
#: the 2 never-graded round-5 names (stream_window_all,
#: stream_count_window_all), all 14 round-7/8 additions (sink tier +
#: sketch/BM25/E-S/iteration/multiprobe batch), and 4 tail regrades
#: (tpch_q7/q9/q21 were in the r5/6 window; r08 re-covered the head).
#: With this fold-in the registry is FULLY current-text driver-green:
#: 257/257, zero stale, zero never-graded, zero red (VERDICT r8).
GRADED_ROUND_8: frozenset[str] = frozenset({
    "tpcds_item_class_share", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q10",
    "tpch_q11", "tpch_q15", "tpch_q22", "agg_cube", "agg_multi_distinct",
    "cdc_canal_apply", "cdc_debezium_apply", "cdc_maxwell_apply",
    "flinksql_computed_column", "flinksql_create_table_like",
    "join_multiway_star", "join_skew_salted", "over_range_frame",
    "over_rows_frame", "scalar_subquery_filter", "tableapi_revenue_by_nation",
    "tpcds_channel_union", "tpcds_cumulative_compare",
    "tpcds_moving_avg_deviation", "tpcds_rollup_rank_within_parent",
    "tpcds_segment_outliers", "window_hop", "tpch_q8", "tpch_q20",
    "join_left_anti", "stream_window_all", "stream_count_window_all",
    "decontam_bloom_filter", "stream_bloom_decontam", "text_bm25_topk",
    "sketch_count_min_words", "text_weighted_sample_es",
    "sketch_hll_cardinality", "stream_hll_cardinality",
    "sim_ann_recall_ivf_multiprobe", "iterate_bfs_hops", "iterate_pagerank",
    "sink_changelog_rowkinds", "sink_upsert_endstate", "sink_print_blackhole",
    "datastream_coflatmap", "agg_basic", "agg_stats", "agg_collect_listagg",
    "agg_first_last_value",
})

#: Every query name the driver graded green in ROUND 9
#: (CORRECTNESS_r09.json — 50 names, zero red; window verified byte-exact
#: == ``ordered_queries()[:50]`` at the graded SHA, per VERDICT r9): the
#: 2 superseded HLL regrades, the 10 round-9 additions (sketch family
#: completion + runtime-filter join + 4 TPC-DS shapes), and 38 oldest
#: rounds-1-2 greens as the rotating drift regrade.
GRADED_ROUND_9: frozenset[str] = frozenset({
    "sketch_hll_cardinality", "stream_hll_cardinality",
    "join_bloom_runtime_filter", "stream_cms_words",
    "sketch_heavy_hitters_mg", "sketch_quantiles_bottomk",
    "stream_quantiles_kmv", "sketch_hll_set_algebra",
    "tpcds_cross_channel_intersect", "tpcds_return_chain_yoy",
    "tpcds_no_returns_channel_ratio", "tpcds_triple_channel_growth",
    "agg_sum0_empty", "agg_grouping_sets", "agg_rollup", "agg_filtered",
    "agg_distinct_split", "cep_errors_then_purchase",
    "cep_funnel_view_click_purchase", "cep_stream_errors_purchase",
    "flinksql_tumble_dialect", "flinksql_split_index_dialect",
    "flinksql_match_recognize", "flinksql_match_recognize_quantified",
    "flinksql_match_recognize_all_rows", "flinksql_match_recognize_skip_nav",
    "flinksql_match_recognize_reluctant", "flinksql_ddl_roundtrip",
    "fn_string_basic", "fn_string_regex_split", "fn_string_encode_hash",
    "fn_math", "fn_temporal", "fn_json", "fn_conditional",
    "fn_array_lambda", "join_inner_broadcast", "join_left_outer",
    "join_right_outer", "join_full_outer", "join_left_semi", "join_cross",
    "join_theta_band", "text_stats", "text_lang_id", "text_token_count",
    "text_fingerprint", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
})

#: Every query name the driver graded green in ROUND 10
#: (CORRECTNESS_r10.json — 50 names, zero red; window verified byte-exact
#: == ``ordered_queries()[:50]`` at the graded SHA, per VERDICT r10): the
#: 9 round-10 additions (classifier train/apply tier, SimHash pairs, PQ
#: recall, TPC-DS q72/q39/q95 shapes) and 41 oldest rounds-1-3 greens as
#: the rotating drift regrade (TPC-H mid-pack, sim_* family, mm_* trio,
#: CEP regrades, evictor/fire streaming tier).
GRADED_ROUND_10: frozenset[str] = frozenset({
    "calc_project_filter", "cdc_temporal_pipeline", "cep_followed_by_any",
    "cep_group_pattern", "cep_or_until", "cep_timeout_abandoned",
    "dedup_embedding_cosine", "dedup_simhash_pairs",
    "flinksql_lateral_udtf", "flinksql_statement_set",
    "flinksql_temporal_asof", "fn_time_type", "join_asof_latest_view",
    "join_null_safe", "mm_decode_stats", "mm_feature_pipeline",
    "mm_frame_sample", "pipeline_classifier_train_apply",
    "setop_except_all", "sim_ann_ivf", "sim_ann_ivf_kmeans",
    "sim_ann_lsh_bucketed", "sim_ann_recall_pq", "sim_cosine_topk",
    "sim_threshold_pairs", "stream_continuous_fire",
    "stream_count_evictor", "stream_delta_evictor",
    "stream_quality_classifier", "stream_topn_per_user",
    "stream_tumble_agg", "tableapi_flat_aggregate",
    "text_classifier_train_gd", "text_quality_classifier", "text_simhash",
    "tpcds_having_count_band", "tpcds_inventory_variance_pair",
    "tpcds_inventory_week_offset", "tpcds_multi_warehouse_ship",
    "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q2", "tpch_q4", "tpch_q6", "window_cumulate",
})

#: Every query name the driver graded green in ROUND 11
#: (CORRECTNESS_r11.json — 50 names, zero red; window verified byte-exact
#: == ``ordered_queries()[:50]`` at the graded SHA, per VERDICT r11): the
#: 5 round-11 additions (IVFADC recall, TPC-DS q51/q23a shapes, streaming
#: IVF ingest assignment, BPE merge training) and 45 oldest round-3/4
#: greens as the rotating drift regrade (setops, source roundtrips,
#: streaming joins/dedup/over/count-windows, window/over/topn tier,
#: percentile aggs, CEP not-next, LLM pipeline regrades).
GRADED_ROUND_11: frozenset[str] = frozenset({
    "agg_approx_distinct", "agg_approx_percentile", "agg_percentiles",
    "cep_not_next", "dedup_cluster_components", "dedup_keep_first",
    "dedup_keep_last", "fn_bit_ops", "fn_url_map", "join_lookup_cached",
    "join_temporal_versioned", "over_lead_lag", "over_rank_fns",
    "pipeline_pretrain_corpus", "sample_split_assignment",
    "setop_except", "setop_intersect", "setop_intersect_all",
    "setop_union_all", "setop_union_distinct", "sim_ann_recall_ivfadc",
    "sort_limit_offset", "src_csv_roundtrip", "src_jdbc_roundtrip",
    "src_json_partitioned", "src_kafka_upsert_roundtrip",
    "src_orc_roundtrip", "src_partitioned_pruning",
    "stream_count_slide_windows", "stream_count_windows",
    "stream_dedup_first", "stream_dedup_keep_last",
    "stream_hop_trigger_windows", "stream_interval_join",
    "stream_interval_join_outer", "stream_ivf_ingest_assign",
    "stream_over_rows", "stream_over_time_range", "stream_sort_limit",
    "stream_window_join", "text_bpe_merges", "text_chunking",
    "text_pack_sequences", "topn_per_group",
    "tpcds_cumulative_channel_fullouter", "tpcds_freq_best_basket",
    "udf_price_bands", "values_inline", "window_session", "window_tumble",
})

#: Every query name the driver graded green in ROUND 12
#: (CORRECTNESS_r12.json — 50 names, zero red; window verified byte-exact
#: == ``ordered_queries()[:50]`` at the graded SHA, per VERDICT r12): the
#: superseded text_bpe_merges regrade, the 11 round-12 additions
#: (composed ANN rerank, trained-PQ recall, hybrid RRF, MMR, composed
#: hybrid→MMR pipeline, PRF, JL projection recall, BPE encode
#: batch+stream, bucketed-catalog join, streaming BM25 standing queries)
#: and 38 stalest regrades (LLM-tier r10 cohort, r9/r8 relational +
#: TPC-DS shape + CEP + dialect tail).
GRADED_ROUND_12: frozenset[str] = frozenset({
    "cep_skip_till_next", "cep_times_or_more_consecutive",
    "dedup_lsh_recall", "dedup_substring_chunks", "distinct_project",
    "flinksql_dialect_extras", "flinksql_temporal_function",
    "fn_temporal_calendar", "join_bucketed_colocated",
    "join_interval_events", "mm_audio_energy", "mm_content_dedup",
    "pipeline_dedup_canonical", "sim_ann_recall",
    "sim_ann_recall_pq_trained", "sim_ann_rerank_recall",
    "sim_hybrid_mmr_pipeline", "sim_hybrid_rrf", "sim_mmr_diversify",
    "sim_quantized_cosine", "sim_random_projection_recall",
    "sort_nulls_ordering", "stream_bm25_standing_queries",
    "stream_bpe_encode", "stream_coprocess_control",
    "stream_embedding_dedup", "stream_lsh_dedup",
    "stream_mm_content_dedup", "text_bm25_prf", "text_bpe_encode",
    "text_bpe_merges", "text_decontaminate", "text_domain_mix_weights",
    "text_pii_redact", "text_quality_gopher", "text_source_quota_sample",
    "text_tfidf_topk", "text_vocab_coverage", "text_word_entropy",
    "tpcds_customer_set_ops", "tpcds_exists_not_exists",
    "tpcds_hour_ratio", "tpcds_market_basket", "tpcds_repeat_buyers",
    "tpcds_scalar_subquery_buckets", "tpcds_yoy_growth", "unnest_explode",
    "unnest_posexplode", "window_session_dynamic_gap",
    "window_tumble_grouped_topn",
})

#: Every query name the driver graded green in ROUND 13
#: (CORRECTNESS_r13.json — 50 names, zero red; window verified byte-exact
#: == ``ordered_queries()[:50]`` at the graded SHA, per VERDICT r13): the
#: 4 round-13 additions (inverted standing-query routing at Q=64, the
#: composed routing→streaming-Top-N alerting product, semantic
#: cell-inverted routing, 3-arm RRF) and 46 stalest regrades (the
#: round-5/6 cohort: TPC-H q7/q9/q21, flinksql kafka/datagen sources,
#: streaming agg/session/dedup-TTL/temporal-sort tier, LLM x-entropy
#: family, TPC-DS r5/6 shapes, udaf_weighted_avg, async_enrich).
GRADED_ROUND_13: frozenset[str] = frozenset({
    "agg_basic", "async_enrich_nations", "datastream_max_by",
    "dedup_exact_normalized", "dedup_semdedup_cells", "fn_math_hyperbolic_truncate",
    "mm_resize_metadata", "mm_scene_cuts", "pipeline_streaming_corpus",
    "sim_ann_recall_ivf", "sim_hybrid_rrf3", "src_datagen_sequence",
    "src_kafka_raw_roundtrip", "src_kafka_startup_timestamp", "src_kafka_tombstones",
    "src_sink_not_null_drop", "stream_bm25_route_inverted", "stream_broadcast_rules",
    "stream_cumulate_agg", "stream_dedup_ttl", "stream_hop_agg",
    "stream_over_unbounded", "stream_route_topn_standing", "stream_semantic_route_cells",
    "stream_session_agg", "stream_session_trigger_windows", "stream_side_outputs",
    "stream_static_join", "stream_temporal_sort", "text_bigram_xentropy",
    "text_dsir_weights", "text_ngram_novelty", "text_repetition_sentences",
    "text_unigram_xentropy", "tpcds_channel_profit_rollup", "tpcds_customer_channel_growth",
    "tpcds_dual_rank_returns", "tpcds_frequent_items_spenders", "tpcds_monthly_pivot",
    "tpcds_multi_band_counts", "tpcds_net_after_returns", "tpcds_repeat_item_purchases",
    "tpcds_revisit_within_90d", "tpcds_share_growth_streak", "tpcds_ship_latency_buckets",
    "tpcds_week_over_week", "tpch_q21", "tpch_q7",
    "tpch_q9", "udaf_weighted_avg",
})

#: Every query name the driver graded green in ROUND 14
#: (CORRECTNESS_r14.json — 50 names, zero red; window verified byte-exact
#: == ``ordered_queries()[:50]`` at the graded SHA, per VERDICT r14): the
#: 5 round-14 additions (updatable routing gate + its semantic twin, the
#: composed updatable Top-N product, the broadcast-TABLE routing form,
#: weighted 3-arm RRF), the superseded-text regrade of
#: stream_route_topn_standing, and 44 stalest regrades (the round-8
#: cohort: agg listagg/cube/stats families, CDC trio, decontam bloom,
#: flinksql DDL family, join tier, sketch/iterate families, sink tier,
#: 8 TPC-H + 6 TPC-DS shapes).
GRADED_ROUND_14: frozenset[str] = frozenset({
    "agg_collect_listagg", "agg_cube", "agg_first_last_value",
    "agg_multi_distinct", "agg_stats", "cdc_canal_apply",
    "cdc_debezium_apply", "cdc_maxwell_apply", "datastream_coflatmap",
    "decontam_bloom_filter", "flinksql_computed_column",
    "flinksql_create_table_like", "iterate_bfs_hops", "iterate_pagerank",
    "join_left_anti", "join_multiway_star", "join_skew_salted",
    "scalar_subquery_filter", "sim_ann_recall_ivf_multiprobe",
    "sim_hybrid_rrf3w", "sink_changelog_rowkinds", "sink_print_blackhole",
    "sink_upsert_endstate", "sketch_count_min_words",
    "stream_bloom_decontam", "stream_bm25_route_broadcast",
    "stream_count_window_all", "stream_route_topn_standing",
    "stream_route_topn_updatable", "stream_route_updatable",
    "stream_semantic_route_updatable", "stream_window_all",
    "tableapi_revenue_by_nation", "text_bm25_topk",
    "text_weighted_sample_es", "tpcds_channel_union",
    "tpcds_cumulative_compare", "tpcds_item_class_share",
    "tpcds_moving_avg_deviation", "tpcds_rollup_rank_within_parent",
    "tpcds_segment_outliers", "tpch_q1", "tpch_q10",
    "tpch_q11", "tpch_q15", "tpch_q20",
    "tpch_q3", "tpch_q5", "tpch_q8",
    "window_hop",
})

#: Every query name the driver graded green in ROUND 15
#: (CORRECTNESS_r15.json — 50 names, zero red; window verified byte-exact
#: == ``ordered_queries()[:50]`` at the graded SHA, per VERDICT r15): the
#: 5 round-15 additions (retained BM25 routing, lexical + semantic
#: runtime ADDS, the interval-artifact updatable route, the composed
#: runtime Top-N product), the three superseded local_table regrades,
#: the CEP family pin, the 3-name round-8 tail, and the head of the
#: round-9 cohort (functions-dialect family, join tier, grouping sets,
#: text/dedup families).
GRADED_ROUND_15: frozenset[str] = frozenset({
    "agg_distinct_split", "agg_filtered", "agg_grouping_sets",
    "agg_rollup", "agg_sum0_empty", "cep_errors_then_purchase",
    "cep_funnel_view_click_purchase", "cep_stream_errors_purchase",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "flinksql_ddl_roundtrip", "flinksql_match_recognize",
    "flinksql_match_recognize_all_rows",
    "flinksql_match_recognize_quantified",
    "flinksql_match_recognize_reluctant",
    "flinksql_match_recognize_skip_nav", "flinksql_split_index_dialect",
    "flinksql_tumble_dialect", "fn_array_lambda", "fn_conditional",
    "fn_json", "fn_math", "fn_string_basic",
    "fn_string_encode_hash", "fn_string_regex_split", "fn_temporal",
    "join_bloom_runtime_filter", "join_cross", "join_full_outer",
    "join_inner_broadcast", "join_left_outer", "join_left_semi",
    "join_right_outer", "join_theta_band", "over_range_frame",
    "over_rows_frame", "stream_bm25_route_retained",
    "stream_route_runtime_add", "stream_route_topn_runtime",
    "stream_route_topn_updatable", "stream_route_updatable",
    "stream_route_updatable_artifact",
    "stream_semantic_route_runtime_add",
    "stream_semantic_route_updatable", "text_fingerprint",
    "text_lang_id", "text_stats", "text_token_count", "tpch_q22",
})

#: Every query name the driver graded green in ROUND 16
#: (CORRECTNESS_r16.json — 50 names, zero red; window verified byte-exact
#: == ``ordered_queries()[:50]`` at the graded SHA, per VERDICT r16): the
#: 2 round-16 additions (the semantic interval-artifact updatable route
#: closing the 8/8 matrix, the kafka-transport updatable route), the
#: three helper-re-staled regrades, the CEP family pin + four CEP
#: siblings, the full 11-name round-9 remainder (sketch + tpcds
#: cross-channel families), and the head of the round-10 cohort
#: (similarity/ANN, multimodal, classifier, simhash families).
GRADED_ROUND_16: frozenset[str] = frozenset({
    "calc_project_filter", "cdc_temporal_pipeline",
    "cep_errors_then_purchase", "cep_followed_by_any",
    "cep_group_pattern", "cep_or_until", "cep_timeout_abandoned",
    "dedup_embedding_cosine", "dedup_simhash_pairs",
    "flinksql_lateral_udtf", "flinksql_statement_set",
    "flinksql_temporal_asof", "fn_time_type", "join_null_safe",
    "mm_decode_stats", "mm_feature_pipeline", "mm_frame_sample",
    "pipeline_classifier_train_apply", "setop_except_all",
    "sim_ann_ivf", "sim_ann_ivf_kmeans", "sim_ann_lsh_bucketed",
    "sim_ann_recall_pq", "sim_cosine_topk", "sim_threshold_pairs",
    "sketch_heavy_hitters_mg", "sketch_hll_cardinality",
    "sketch_hll_set_algebra", "sketch_quantiles_bottomk",
    "stream_cms_words", "stream_continuous_fire",
    "stream_count_evictor", "stream_delta_evictor",
    "stream_hll_cardinality", "stream_quality_classifier",
    "stream_quantiles_kmv", "stream_route_runtime_add",
    "stream_route_topn_runtime", "stream_route_updatable_artifact",
    "stream_route_updatable_kafka",
    "stream_semantic_route_updatable_artifact", "stream_topn_per_user",
    "stream_tumble_agg", "text_classifier_train_gd",
    "text_quality_classifier", "text_simhash",
    "tpcds_cross_channel_intersect", "tpcds_no_returns_channel_ratio",
    "tpcds_return_chain_yoy", "tpcds_triple_channel_growth",
})

#: Every query name the driver graded green in ROUND 17
#: (CORRECTNESS_r17.json — 50 names, zero red; per VERDICT r17 the
#: window regraded ALL 23 then-SUPERSEDED_GREENS — the optimization
#: round's routing-tier/stage-drain/shard rewrites plus the inherited
#: gate/sink changes — plus the new chunked-kafka row and the head of
#: the grade-age rotation).
GRADED_ROUND_17: frozenset[str] = frozenset({
    "agg_approx_distinct", "agg_approx_percentile", "agg_percentiles",
    "cep_errors_then_purchase", "cep_not_next", "datastream_coflatmap",
    "datastream_max_by", "fn_bit_ops", "fn_url_map",
    "join_asof_latest_view", "pipeline_pretrain_corpus",
    "pipeline_streaming_corpus", "sink_changelog_rowkinds",
    "sink_upsert_endstate", "stream_bm25_route_broadcast",
    "stream_bm25_route_inverted", "stream_bm25_route_retained",
    "stream_broadcast_rules", "stream_count_window_all",
    "stream_embedding_dedup", "stream_lsh_dedup",
    "stream_mm_content_dedup", "stream_route_runtime_add",
    "stream_route_topn_runtime", "stream_route_topn_standing",
    "stream_route_topn_updatable", "stream_route_updatable",
    "stream_route_updatable_artifact", "stream_route_updatable_kafka",
    "stream_route_updatable_kafka_chunked", "stream_semantic_route_cells",
    "stream_semantic_route_updatable", "stream_window_all",
    "tableapi_flat_aggregate", "text_chunking",
    "tpcds_having_count_band", "tpcds_inventory_variance_pair",
    "tpcds_inventory_week_offset", "tpcds_multi_warehouse_ship",
    "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q16", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q2", "tpch_q4", "tpch_q6",
    "window_cumulate",
})

#: Queries whose Spark+oracle TEXT was rewritten AFTER their last
#: driver-green grade — the green row grades superseded text.
#: Round 17: emptied at the r16 fold-in (the three helper-re-staled
#: rows — stream_route_updatable_artifact, stream_route_runtime_add,
#: stream_route_topn_runtime — were regraded green in CORRECTNESS_r16).
#: MECHANISM (round 17, replacing the round-16 stated policy): the
#: graded text hash now covers the query function's own source, its
#: oracle, AND the source of every package-local helper in its static
#: call closure (scripts/record_text_hashes.py walks the AST), so a
#: semantic edit to a shared stage helper FLIPS the recorded hash of
#: every delegating graded row and test_graded_text_unchanged fails
#: until those names are re-added here.  Re-add a name here whenever
#: its pinned text (own or closure) is rewritten before the next
#: grade — and on regrade, remove it and re-record its text hash
#: (scripts/record_text_hashes.py), which is what makes
#: rewrite-without-regrade impossible to ship silently
#: (tests/test_registry_oracle.py::test_graded_text_unchanged).
#: Round 17, later: the broadcast_rule_gate state upgrade (live-rule
#: set -> control-event history, replayed positionally across
#: micro-batches — found by the adversarial partition-boundary split
#: receipt, tests/test_kafka_adversarial.py) re-staled the four graded
#: rows whose helper closure contains the gate.  THIS set was COMPUTED
#: by the new mechanism (diff of current_hashes() against the recorded
#: file), not recalled by review — the round-16 wobble class is closed.
#: The companion nullability pin in broadcast_connect (the _shard state
#: key must be schema-identical in every micro-batch plan) re-staled
#: five more rows whose closure reaches broadcast_connect through other
#: operators — names the round-16-style manual policy would have
#: MISSED; the mechanism computed them.
#: Round 17, later still: UpsertSink.merge_batch gained the
#: already-committed replay short-circuit (a foreachBatch retry after
#: the manifest repoint read the snapshot dir while overwrite-deleting
#: it — FAILED_READ_FILE at scale); the closure diff computed the two
#: delegating rows below (sink_changelog_rowkinds, sink_upsert_endstate).
#: Round 18: emptied at the r17 fold-in — all 23 round-17 rewrites were
#: regraded green in CORRECTNESS_r17 (VERDICT r17 confirms the window
#: covered every touched row).  Names re-added below are round-18
#: optimization rewrites awaiting their regrade (sets computed by the
#: closure-hash diff, scripts/record_text_hashes.py — not recalled).
SUPERSEDED_GREENS: frozenset[str] = frozenset({
    # r18 hygiene (ADVICE r17 / VERDICT r17 "What's wrong" #2):
    # run_foreach_batch now raises on an availableNow timeout instead of
    # silently returning a partial drain, run_to_stage registers its
    # stage dir for the interpreter-exit sweep, and _route_artifact_rows
    # gained the zero-term guard — all no-ops on every green path
    "sink_changelog_rowkinds",
    "sink_upsert_endstate",
    "stream_bm25_route_broadcast",
    "stream_bm25_route_inverted",
    "stream_bm25_route_retained",
    "stream_route_runtime_add",
    "stream_route_topn_runtime",
    "stream_route_topn_standing",
    "stream_route_topn_updatable",
    "stream_route_updatable",
    "stream_route_updatable_artifact",
    "stream_route_updatable_kafka",
    "stream_route_updatable_kafka_chunked",
    "stream_semantic_route_runtime_add",
    "stream_semantic_route_updatable_artifact",
    # r18 (ADVICE r17 #2): the driver-side nprobe probe extracted into
    # the ONE shared implementation (retrieval.probe_cells) called by
    # both the library operator and the semantic routing queries —
    # arithmetic unchanged, pinned by the existing graded-equality test
    "stream_semantic_route_cells",
    "stream_semantic_route_updatable",
    # r18 ANN-tier optimization (VERDICT r17 "Next round" #2), all
    # value-exact by interleaved A/B at sf0.01 + sf0.1
    # (scripts/ab_kmeans_literal.py, scripts/ab_ann_equality.py):
    # literal-codebook row-local kmeans assign (kmeans.py), max_by +
    # hoisted-norm ivfadc, matched-sliver rrf3 BM25 arm.
    # sim_ann_recall_ivfadc is added BY HAND: its Spark text lives in a
    # module-level _sql_pair call, outside the closure walker's reach
    # (the oracle side IS covered and unchanged).
    "sim_ann_ivf_kmeans",
    "sim_ann_recall_pq_trained",
    "sim_ann_recall_ivfadc",
    "sim_hybrid_rrf3",
    "sim_hybrid_rrf3w",
    # r18 (VERDICT r17 "Next round" #1): streaming_first_seen_flag's
    # shard floor raised 64 -> 1024 after the driver-conditions
    # interleaved A/B (scripts/ab_lsh_shards.py receipt) — flags are
    # shard-count-invariant (property-tested), behavior on local[32]
    # restored to the r16-graded constant
    "pipeline_streaming_corpus",
    "stream_embedding_dedup",
    "stream_lsh_dedup",
    "stream_mm_content_dedup",
    # r18 (VERDICT r17 "Next round" #5): the event-window tier's per-key
    # state moved behind sharded_keyed_process (hash(key) % shards
    # grouping, per-key logic unchanged and driven by the same property
    # suites) — emitted rows identical, fresh-session interleaved A/B
    # ahead on all three bench rows (scripts/time_rows.py receipts)
    "datastream_coflatmap",
    "datastream_max_by",
    "stream_continuous_fire",
    "stream_count_evictor",
    "stream_count_window_all",
    "stream_delta_evictor",
    "stream_hop_trigger_windows",
    "stream_session_trigger_windows",
    "stream_temporal_sort",
    "stream_window_all",
})

#: Family-coverage regrade pins (VERDICT r14 "Next round" #6): names
#: placed in the grading window RIGHT AFTER the verification debt, ahead
#: of the plain grade-age tail, because their operator FAMILY is
#: custom-code-heavy enough to deserve a regular driver re-proof even
#: when other rows are staler.  Round 15: one slot on the CEP NFA path
#: (operators/cep.py, 1423 LoC of custom engine, newest family grade
#: r12).  Keep this list SHORT (<= 2) — every pin displaces a stale
#: regrade slot.
FAMILY_REGRADE_PINS: list[str] = [
    "cep_errors_then_purchase",
]


def _grade_age_key(name: str) -> int:
    """Sort key for the rotating regrade: lower = higher grading priority.

    0 = superseded green (grade predates current text — regrade first),
    1 = never driver-graded (includes queries added this round),
    then graded names oldest-grade-first (rounds 1-2 before 3 before 4 …)
    so the driver's 50-slot window continuously re-verifies the stalest
    grades against engine/oracle drift (VERDICT r8 "Next round" #2).
    A name graded in several rounds counts as its NEWEST grade.
    """
    if name in SUPERSEDED_GREENS:
        return 0
    age = 1  # never graded
    for bump, cohort in enumerate(
        (GRADED_ROUNDS_1_2, GRADED_ROUND_3, GRADED_ROUND_4,
         GRADED_ROUND_5_6, GRADED_ROUND_8, GRADED_ROUND_9,
         GRADED_ROUND_10, GRADED_ROUND_11, GRADED_ROUND_12,
         GRADED_ROUND_13, GRADED_ROUND_14, GRADED_ROUND_15,
         GRADED_ROUND_16, GRADED_ROUND_17), start=2,
    ):
        if name in cohort:
            age = bump
    return age


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES reordered for the driver's 50-slot grading window:
    priority names first, then superseded greens + never-graded queries
    (this round's additions), then family-coverage pins, then graded
    names oldest first."""
    out: dict[str, QueryFn] = {}
    for name in QUERY_PRIORITY:
        if name in QUERIES:
            out[name] = QUERIES[name]
    rest = [n for n in QUERIES if n not in out]
    pins = {n: i for i, n in enumerate(FAMILY_REGRADE_PINS)}
    # Pinned names slot between the verification debt (keys 0/1) and the
    # plain grade-age tail (keys >= 2); a pin that is itself debt keeps
    # its debt key and ignores the pin entirely (ADVICE r15).
    _PIN_SLOT = 1.5

    def _window_key(n: str) -> tuple[float, int]:
        k = _grade_age_key(n)
        if k <= 1:
            return (k, 0)
        if n in pins:
            return (_PIN_SLOT, pins[n])
        return (k, 0)

    rest.sort(key=_window_key)
    for n in rest:
        out[n] = QUERIES[n]
    return out


def ordered_oracles() -> dict[str, str]:
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from flink_1_12_0_spark.queries import (  # noqa: F401
        aggregates,
        cep,
        flinksql,
        functions_dialect,
        joins,
        llm_corpus,
        llm_similarity,
        llm_text,
        multimodal,
        relational,
        setops,
        sink_tier,
        sources_cdc,
        streaming_batch,
        streaming_stateful,
        tableapi,
        temporal_joins,
        timewindows,
        tpcds_shape,
        tpch,
        windows,
    )


#: HISTORICAL (round-4 bookkeeping, kept for audit): the 90 queries
#: never driver-graded after rounds 1-3, in the promotion order used
#: then.  Round 4's window was the first 48 of these plus the regrade
#: head; the tail became part of round 5's `_ROUND5_WINDOW` below.
QUERY_PRIORITY_ROUND4: list[str] = [
    "unnest_explode",
    "unnest_posexplode",
    "window_session_dynamic_gap",
    "window_tumble_grouped_topn",
    "join_interval_events",
    "cdc_canal_apply",
    "cdc_maxwell_apply",
    "tableapi_revenue_by_nation",
    "sort_nulls_ordering",
    "scalar_subquery_filter",
    "distinct_project",
    "agg_percentiles",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "pipeline_pretrain_corpus",
    "text_chunking",
    "text_quality_gopher",
    "text_decontaminate",
    "text_pii_redact",
    "text_domain_mix_weights",
    "sample_split_assignment",
    "sim_quantized_cosine",
    "sim_ann_recall",
    "mm_audio_energy",
    "mm_content_dedup",
    "tpcds_channel_union",
    "tpcds_yoy_growth",
    "tpcds_segment_outliers",
    "tpcds_item_class_share",
    "tpcds_customer_set_ops",
    "tpcds_moving_avg_deviation",
    "tpcds_exists_not_exists",
    "tpcds_scalar_subquery_buckets",
    "tpcds_hour_ratio",
    "text_tfidf_topk",
    "text_source_quota_sample",
    "dedup_substring_chunks",
    "text_vocab_coverage",
    "text_word_entropy",
    "tpcds_market_basket",
    "tpcds_repeat_buyers",
    "flinksql_create_table_like",
    "flinksql_computed_column",
    "dedup_lsh_recall",
    "stream_lsh_dedup",
    "stream_embedding_dedup",
    "pipeline_dedup_canonical",
    "stream_mm_content_dedup",
    "sim_ann_recall_ivf",
    "tpcds_multi_band_counts",
    "tpcds_ship_latency_buckets",
    "text_unigram_xentropy",
    "dedup_exact_normalized",
    "fn_temporal_calendar",
    "cep_skip_till_next",
    "tpcds_week_over_week",
    "tpcds_customer_channel_growth",
    "dedup_semdedup_cells",
    "src_kafka_raw_roundtrip",
    "src_datagen_sequence",
    "flinksql_temporal_function",
    "text_bigram_xentropy",
    "stream_session_trigger_windows",
    "stream_temporal_sort",
    "datastream_max_by",
    "tpcds_net_after_returns",
    "tpcds_dual_rank_returns",
    "fn_math_hyperbolic_truncate",
    "text_repetition_sentences",
    "tpcds_frequent_items_spenders",
    "tpcds_share_growth_streak",
    "mm_scene_cuts",
    "flinksql_dialect_extras",
    "src_kafka_tombstones",
    "src_sink_not_null_drop",
    "udaf_weighted_avg",
    "async_enrich_nations",
    "stream_side_outputs",
    "tpcds_monthly_pivot",
    "tpcds_channel_profit_rollup",
    "pipeline_streaming_corpus",
    "mm_resize_metadata",
    "tpcds_revisit_within_90d",
    "tpcds_repeat_item_purchases",
    "cep_times_or_more_consecutive",
    "text_ngram_novelty",
    "stream_session_agg",
    "stream_static_join",
    "stream_hop_agg",
    "stream_cumulate_agg",
]

#: Driver-grading priority for ROUND 5.  The window (first 50
#: registered names) = the 47 queries never driver-graded after rounds
#: 1-4 — QUERY_PRIORITY_ROUND4[48:] (42 names) plus the five round-4
#: additions that missed round 4's window — with the CEP long tail
#: promoted to the front (highest-custom-risk family, VERDICT r4 #6),
#: then the 3 spare slots on stale-green regrades (the three
#: de-trivialized TPC-H queries whose text changed most after their
#: rounds-1-2 grades; see SUPERSEDED_GREENS).  This finishes the
#: registry's first full driver exposure.
_ROUND5_WINDOW: list[str] = [
    # CEP long tail first (VERDICT r4 #6): the only §2.9 CEP rows
    # whose driver proof is pending
    "cep_skip_till_next",
    "cep_times_or_more_consecutive",
    # the five round-4 additions that missed round 4's window
    "src_kafka_startup_timestamp",
    "stream_broadcast_rules",
    "stream_dedup_ttl",
    "stream_over_unbounded",
    "text_dsir_weights",
    # remainder of QUERY_PRIORITY_ROUND4[48:], original promotion order
    "sim_ann_recall_ivf",
    "tpcds_multi_band_counts",
    "tpcds_ship_latency_buckets",
    "text_unigram_xentropy",
    "dedup_exact_normalized",
    "fn_temporal_calendar",
    "tpcds_week_over_week",
    "tpcds_customer_channel_growth",
    "dedup_semdedup_cells",
    "src_kafka_raw_roundtrip",
    "src_datagen_sequence",
    "flinksql_temporal_function",
    "text_bigram_xentropy",
    "stream_session_trigger_windows",
    "stream_temporal_sort",
    "datastream_max_by",
    "tpcds_net_after_returns",
    "tpcds_dual_rank_returns",
    "fn_math_hyperbolic_truncate",
    "text_repetition_sentences",
    "tpcds_frequent_items_spenders",
    "tpcds_share_growth_streak",
    "mm_scene_cuts",
    "flinksql_dialect_extras",
    "src_kafka_tombstones",
    "src_sink_not_null_drop",
    "udaf_weighted_avg",
    "async_enrich_nations",
    "stream_side_outputs",
    "tpcds_monthly_pivot",
    "tpcds_channel_profit_rollup",
    "pipeline_streaming_corpus",
    "mm_resize_metadata",
    "tpcds_revisit_within_90d",
    "tpcds_repeat_item_purchases",
    "text_ngram_novelty",
    "stream_session_agg",
    "stream_static_join",
    "stream_hop_agg",
    "stream_cumulate_agg",
    # 3 spare slots: stale-green regrades (round-4 de-trivialization
    # rewrote their text after the rounds-1-2 grades; these three had
    # the largest schema/constant changes — q8/q20/q22/join_left_anti
    # head round 6's window via SUPERSEDED_GREENS ordering)
    "tpch_q9",
    "tpch_q21",
    "tpch_q7",
]

#: Driver-grading priority for ROUND 7 — the rotation registry.py has
#: prescribed since round 5, finally executed.  The window (first 50
#: registered names) = the complete verification debt: all 30
#: SUPERSEDED_GREENS (27 float-hardening rewrite-stale + 3 carried from
#: round 4) plus the 2 never-graded round-5 additions.
#: tpcds_item_class_share heads the list (round 6's one red: DecimalType
#: share, fixed round 7 with a 100e0 DOUBLE literal).  Queries newly
#: registered in round 7 (sink tier, …) are NOT listed here —
#: ordered_queries() sorts never-graded names directly after this list,
#: inside the 50-slot window.  After round 7's grading: fold greens into
#: GRADED_ROUND_7, empty SUPERSEDED_GREENS, and re-record text hashes —
#: the registry is then fully current-text driver-green.
_ROUND7_WINDOW: list[str] = [
    "tpcds_item_class_share",
    # the other 26 float-hardening rewrites (round 6) never regraded
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q10",
    "tpch_q11",
    "tpch_q15",
    "tpch_q22",
    "agg_cube",
    "agg_multi_distinct",
    "cdc_canal_apply",
    "cdc_debezium_apply",
    "cdc_maxwell_apply",
    "flinksql_computed_column",
    "flinksql_create_table_like",
    "join_multiway_star",
    "join_skew_salted",
    "over_range_frame",
    "over_rows_frame",
    "scalar_subquery_filter",
    "tableapi_revenue_by_nation",
    "tpcds_channel_union",
    "tpcds_cumulative_compare",
    "tpcds_moving_avg_deviation",
    "tpcds_rollup_rank_within_parent",
    "tpcds_segment_outliers",
    "window_hop",
    # round-4 de-trivialization stale greens, carried two rounds
    "tpch_q8",
    "tpch_q20",
    "join_left_anti",
    # never driver-graded (registered round 5)
    "stream_window_all",
    "stream_count_window_all",
]

#: ROUND 15 NOTE: CORRECTNESS_r14.json landed (50 names, zero red;
#: window byte-exact == ordered_queries()[:50] at the graded SHA, per
#: VERDICT r14), so the fold-in is DONE above: GRADED_ROUND_14 added
#: (three playbook places), SUPERSEDED_GREENS emptied at fold-in
#: (stream_route_topn_standing regraded green on current text, its
#: entry removed), text hashes re-recorded.  LATER in round 15,
#: SUPERSEDED_GREENS was re-populated with the three updatable-tier
#: rows whose fixture write moved to local_table (see its docstring) —
#: both statements are true in sequence, not in conflict (the r14
#: ADVICE note lesson).  Round 15's window (pinned by
#: test_round15_window_manifest): this round's new additions + the
#: three superseded regrades first (debt), then the CEP family pin
#: (FAMILY_REGRADE_PINS — VERDICT r14 #6), then the stalest greens —
#: the 3-name round-8 tail (over_range_frame, over_rows_frame,
#: tpch_q22) and the head of the 50-name round-9 cohort (functions
#: dialect family, sort/NULLS rows, theta join, distinct-split agg)
#: per VERDICT r14 "Next round" #4.
#: ROUND 16 NOTE: CORRECTNESS_r15.json landed (50 names, zero red;
#: window byte-exact == ordered_queries()[:50] at the graded SHA, per
#: VERDICT r15), so the fold-in is DONE above: GRADED_ROUND_15 added
#: (three playbook places), SUPERSEDED_GREENS emptied (the three
#: local_table regrades went green).  Round 16's window (pinned by
#: test_round16_window_manifest): this round's new additions first
#: (debt), then the CEP family pin, then the stalest greens — the
#: 11-name round-9 remainder (sketch family + tpcds cross-channel
#: family, VERDICT r15 "What's missing" #2) and the head of the 50-name
#: round-10 cohort.
#: ROUND 17 NOTE: CORRECTNESS_r16.json landed (50 names, zero red;
#: window byte-exact == ordered_queries()[:50] at the graded SHA, per
#: VERDICT r16), so the fold-in is DONE above: GRADED_ROUND_16 added
#: (three playbook places), SUPERSEDED_GREENS emptied (the three
#: helper-re-staled rows went green).  Round 17's window (pinned by
#: test_round17_window_manifest): this round's additions first (debt),
#: then the CEP family pin, then the stalest greens — the round-10
#: cohort remainder then the head of the round-11 cohort (VERDICT r16
#: "Next round" #3).
#: ROUND 18 NOTE: CORRECTNESS_r17.json landed (50 names, zero red; the
#: window covered ALL 23 round-17 SUPERSEDED_GREENS per VERDICT r17),
#: so the fold-in is DONE above: GRADED_ROUND_17 added (three playbook
#: places — _grade_age_key, record_text_hashes.py,
#: test_registry_ordering._graded_current), SUPERSEDED_GREENS emptied,
#: hashes re-recorded.  When CORRECTNESS_r18 lands: fold per the same
#: playbook.  _ROUND7_WINDOW kept (unused) for audit history.
#:
#: REGISTRY GROWTH POLICY (VERDICT r14 "Next round" #8, adopted): at
#: ~300 rows and a 50-name driver window, the full regrade cycle is six
#: rounds.  That is acceptable while every row stays green in the LOCAL
#: full-registry sweep (scripts/sweep_sf001.py, required green at every
#: snapshot SHA) — the driver window re-proves staleness, the sweep
#: proves current-text correctness every round.  We therefore do NOT
#: retire twins from the rotation; instead growth is bounded at the
#: source: new rows are added only for (a) never-covered reference
#: operators, (b) scale-shape twins whose PLAN differs (inline vs
#: broadcast, standing vs updatable), or (c) judge-requested receipts.
#: Cosmetic variants of an already-graded shape get a pytest, not a
#: registry row.  Revisit if the cycle exceeds eight rounds.
QUERY_PRIORITY: list[str] = []
_ = _ROUND7_WINDOW  # retained for audit; superseded by grade-age ordering
