"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All entries live in :mod:`openeo_odc_driver_spark.registry` (cube
operators, SURVEY §2) and :mod:`openeo_odc_driver_spark.registry_pipeline`
(dedup / similarity / text / multimodal / streaming extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the engine importable regardless of the caller's cwd (and ship the
# repo to local-mode Python workers via PYTHONPATH for pandas-UDF closures)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    if os.environ.get("PYTHONPATH")
    else _REPO_ROOT
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's golden
    NDVI pipeline shape (tests/process_graphs/NDVI_Bolzano_median.json) —
    load_collection → per-pixel normalized difference → median over time."""
    from openeo_odc_driver_spark.registry import flagship_ndvi

    return flagship_ndvi(spark, "/root/testdata/sf0.001")


# The driver's correctness gate runs queries in registration order under a
# bounded window (~50 per round). All previously registered queries have a
# green driver row, so the ordering is STALEST-FIRST (VERDICT r5 item 5 /
# r6 item 5): never-checked round-8 queries lead, then queries whose
# latest green row is r02, r03, ... — so a silent regression in a
# long-unchecked op surfaces in the next window instead of never.
# Regenerated for round 13 from CORRECTNESS_r01..r12 with the snippet in
# scratch/verify_local.py's docstring.
#
# _GATE_PRIORITY_ASOF records which driver reports the list was derived
# from: staleness asserts (tests/test_registry.py) ignore any
# CORRECTNESS_r{N}.json with N > ASOF, so the list stays self-consistent
# when THIS round's report lands (VERDICT r7 item 1 — the round-boundary
# breakage class).
_GATE_PRIORITY_ASOF = 14
_GATE_PRIORITY = [
    "resample_spatial_warp_directions_sweep",
    "process_graph_ndvi_tiers_sweep",
    "tiled_store_overview",
    "tiled_aggregate_temporal_season",
    "tiled_apply_kernel",
    "tiled_filter_bbox",
    "tiled_mask",
    "tiled_ndvi_median",
    "tiled_pipeline_e2e",
    "tiled_reduce_bands_mean",
    "tiled_roundtrip",
    "tiled_save_load",
    "aggregate_spatial_window_trim",
    "aggregate_temporal_period_month",
    "apply_kernel_tiled",
    "chunk_documents",
    "climatological_normal",
    "decontaminate_exact",
    "decontaminate_ngram",
    "events_json_extract",
    "filter_bbox_crs",
    "frame_sample",
    "geocode_linear",
    "load_collection_decode",
    "load_collection_polygon",
    "merge_cubes_bands",
    "merge_cubes_time",
    "mix_epochs",
    "pack_token_ids_spans",
    "pipeline_neardedup_sample_chunk_stats",
    "predict_curve_linear",
    "process_graph_masked_seasonal",
    "process_graph_masked_seasonal_tiled",
    "process_graph_ndvi",
    "quality_score",
    "quantiles",
    "radar_mask",
    "resample_cube_spatial_bilinear",
    "resample_cube_temporal",
    "run_udf_grouped",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "stateful_running_max",
    "streaming_dedup",
    "tiled_apply_math",
    "tiled_filter_bands_temporal",
    "tiled_merge_bands",
    "tiled_merge_resolver",
    "tiled_resample_spatial",
    "token_count",
    "token_fertility_stats",
    "bigram_logprob",
    "bloom_decontaminate",
    "bpe_learn_merges",
    "bpe_pair_counts",
    "cdc_chunks",
    "corpus_shard_layout",
    "corpus_stats_sketch",
    "count_min_heavy_grams",
    "domain_stats",
    "dsir_importance_weights",
    "embedding_int8_quantize",
    "event_anomaly_hours",
    "event_funnel",
    "event_retention_cohorts",
    "event_sessionize",
    "events_user_type_pivot",
    "exact_substring_dedup",
    "multimodal_webp_decode",
    "pipeline_quality_dedup_stats",
    "pq_ann",
    "pq_encode",
    "process_graph_masked_seasonal_tiled_store",
    "process_graph_resample_pushdown",
    "reduce_bands_mean",
    "reduce_x_sum",
    "reduce_y_max",
    "resample_cube_spatial",
    "run_udf",
    "sample_stratified",
    "shuffle_shards",
    "streaming_session_windows",
    "streaming_sliding_counts",
    "streaming_static_enrich",
    "streaming_tumbling_hourly",
    "tfidf_top_terms",
    "tiled_climatological_normal",
    "tiled_zonal_concave",
    "fit_curve_harmonic",
    "gopher_quality_flags",
    "incremental_corpus_stats",
    "intra_doc_dedup",
    "ivf_pq_ann",
    "jsonl_roundtrip",
    "kmeans_train",
    "minhash_dedup_incremental",
    "multimodal_audio_decode",
    "multimodal_decode",
    "orders_per_nation",
    "orders_rollup",
    "pack_sequences",
    "pack_token_ids",
    "paragraph_dedup",
    "pii_scan",
    "pipeline_rule_model_mix_stats",
    "priority_sample",
    "process_graph_fit_curve",
    "process_graph_resample_align",
    "process_graph_resample_align_tiled",
    "quality_classifier_score",
    "quality_classifier_train",
    "repetition_scores",
    "semantic_dedup_clusters",
    "streaming_corpus_ingest_stats",
    "streaming_quality_filter",
    "temperature_sample_langs",
    "tiled_aggregate_period_median",
    "tiled_array_interpolate",
    "tiled_filter_bbox_native",
    "tiled_quantiles",
    "tiled_quantiles_x",
    "tiled_radar_mask",
    "tiled_reduce_y_max",
    "tiled_resample_cube_spatial",
    "tiled_resample_cube_spatial_bilinear",
    "tiled_resample_cube_temporal",
    "tiled_zonal_mean_store",
    "tokenize_to_ids",
    "tpch_q1",
    "tpch_q14_promo_revenue",
    "tpch_q5_local_supplier_volume",
    "add_cubes",
    "add_dimension",
    "aggregate_spatial_product",
    "ann_recall_trained",
    "exact_substring_dedup_salted",
    "filter_bands",
    "filter_bbox",
    "filter_spatial",
    "filter_temporal",
    "ivf_pq_ann_trained",
    "load_collection_lineitem",
    "load_result_roundtrip",
    "minhash_lsh_pairs_tuned",
    "multimodal_image_features",
    "multimodal_jpeg_decode",
    "multimodal_resize",
    "tiled_quantiles_bands",
    "tiled_resample_cube_spatial_upscale",
    "unigram_logprob",
    "vocab_top_terms",
    "zorder_bucket_stats",
    "aggregate_spatial_sweep",
    "apply_kernel_border_sweep",
    "bm25_scores",
    "char_entropy",
    "copurchase_communities",
    "copurchase_pagerank",
    "copurchase_related_parts",
    "copurchase_triangles",
    "corpus_datasheet",
    "corpus_delta",
    "csv_roundtrip",
    "decontaminate_semantic",
    "decontaminate_semantic_lsh",
    "event_funnel_windowed",
    "event_session_type_pairs",
    "event_top_paths",
    "event_weekly_stickiness",
    "exact_dedup_normalized",
    "gtiff_store_roundtrip",
    "math_sweep_arith",
    "math_sweep_logic",
    "math_sweep_rounding",
    "math_sweep_transcendental",
    "minhash_dedup_incremental_auto",
    "minhash_lsh_pairs_auto",
    "minhash_recall_tiers",
    "multimodal_audio_features",
    "multimodal_image_phash",
    "multimodal_phash_near_dup",
    "normalized_difference",
    "pii_redact",
    "pipeline_release_stats",
    "process_graph_merge_resolver",
    "process_graph_predict_harmonic",
    "reduce_time_sweep",
    "rename_labels_sweep",
    "script_census",
    "select_token_budget",
    "select_token_budget_by",
    "semantic_dedup_trained",
    "semantic_dedup_trained_k160",
    "semantic_dedup_vectorized_k160",
    "shingle_containment_pairs",
    "source_overlap_matrix",
    "tiled_apply_kernel_border_sweep",
    "tiled_apply_kernel_wrap_partial",
    "tiled_reduce_time_sweep",
    "tiled_reduce_x_sweep",
    "tiled_zonal_sweep",
    "aggregate_spatial_window",
    "aggregate_temporal_period_season",
    "ann_recall",
    "anomaly",
    "apply_kernel",
    "array_element_sweep",
    "array_interpolate_linear",
    "brute_force_topk",
    "copurchase_pagerank_shuffle",
    "dedup_keep_first",
    "doc_fingerprint",
    "drop_dimension",
    "embedding_cosine_dup_pairs",
    "events_hourly",
    "exact_dedup",
    "fit_curve_linear",
    "flagship_ndvi",
    "geocode_nearest",
    "gtiff_time_planes_roundtrip",
    "ivf_flat_ann",
    "lang_id",
    "lsh_bucket_ann",
    "mask_sweep",
    "merge_cubes_resolver",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "near_dup_clusters",
    "near_dup_keep_representative",
    "ngram_jaccard_pairs",
    "orders_topk_per_customer",
    "phash_recall_tiers",
    "resample_spatial_warp_sweep",
    "semantic_dedup_auto",
    "split_leakage_report",
    "streaming_minhash_dedup",
    "streaming_pii_redact",
    "synthetic_cube",
    "temperature_sample_domains",
    "text_content_ann",
    "text_content_topk",
    "text_feature_embedding",
    "token_length_histogram",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_idle_customers",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "train_split_census",
]


def _ordered(mapping):
    pri = [k for k in _GATE_PRIORITY if k in mapping]
    rest = [k for k in mapping if k not in set(pri)]
    return {k: mapping[k] for k in pri + rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + pipeline ops."""
    from openeo_odc_driver_spark.registry import QUERIES

    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every query: SQL-expressible ops carry bit-exact
    structural twins (see registry docstrings); non-SQL-expressible ops
    (iterative fits, pandas-UDF decoders) carry fixed-expected-value
    literal oracles captured from the deterministic sf0.01 fixture
    (openeo_odc_driver_spark/fixtures/). Every key in queries() has an
    oracle — there are no rows-only entries."""
    from openeo_odc_driver_spark.registry import ORACLE

    return _ordered(ORACLE)
