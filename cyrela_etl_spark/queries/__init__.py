"""Declared-query registry: every operator the engine claims is DONE has a
(spark_fn, oracle_sql) pair here. The driver runs the Spark side at sf0.01
and the oracle in DuckDB over the same parquet tables and compares
row-count + schema + order-insensitive value hash.

Determinism contract (what makes the hashes match):
- money aggregates go through DECIMAL (exact, association-free), cast to
  double only at the end;
- ratios are single IEEE-754 divisions of exact ints — bit-identical
  everywhere;
- hash outputs derive from md5 (portable, see functions/hashing.py);
- every double that results from a multi-term float fold (cosine) is
  rounded to 6 digits on BOTH sides before ranking/output.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, fn: SparkQuery, oracle: str | None) -> None:
    if name in REGISTRY:
        raise ValueError(f"duplicate query name {name}")
    REGISTRY[name] = (fn, oracle)


# Scoring-priority order: the driver walks the returned dict in insertion
# order and scores AT MOST ~50 entries per round. Slot allocation for
# round 6 (122 registered queries, all oracle-backed — keep this count in
# sync with len(REGISTRY); VERDICT r5 ADVICE flagged a stale count here):
#   block 0 (21): operators new in round 6, never scored — first;
#   block A (16): every events-reader. The driver regenerated events.parquet
#     with a new ts encoding after round 5's last commit, so ALL prior green
#     rows for these queries describe the old physical schema — stale by
#     definition. 8 errored in r5 (whole stream_* family, incl. the
#     never-green stream_interval_join) and 8 more fail-localled
#     (temporal_* ×5, func_json_extract, grouped_map_normalize,
#     minmax_normalize_window). The round-6 reader is dtype-adaptive
#     (sources/parquet.py); these must produce fresh rows first.
#   block B: the tail whose last driver row is r3 (corpus_*, agg_*,
#     func_*, fuzzy_*, sql_*, plus singles) — oldest-risk first so the
#     whole registry has a fresh row within r6-r7.
#   tail (unlisted): everything green in r5 over files unchanged in round 6
#     — the safest thing to leave unscored this round.
_PRIORITY: list[str] = [
    # -- new in round 6 (never scored) --------------------------------------
    "dedup_contamination",
    "text_lm_score",
    "text_bm25_topk",
    "quality_classifier_filter",
    "corpus_weighted_sample",
    "corpus_boilerplate_removal",
    "storage_numeric_profile",
    "events_anomaly_zscore",
    "vector_sq_int8_topk",
    "vector_pq_adc_topk",
    "vector_semdedup_pairs",
    "temporal_ohlc",
    "scale_skew_profile",
    "stream_upsert_sink",
    "storage_zorder_cluster",
    "storage_jsonl_roundtrip",
    "storage_jsonl_badrecords",
    "search_hybrid_rrf",
    "events_funnel",
    "graph_triangle_stats",
    "storage_histogram_drift",
    # -- block A: events-readers (all rows stale after the ts-encoding drift)
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_stateful_running",
    "stream_static_enrich",
    "stream_parquet_sink",
    "stream_interval_join",
    "temporal_asof_join",
    "temporal_range_join",
    "temporal_time_bucket",
    "temporal_gap_fill",
    "temporal_sessionize",
    "func_json_extract",
    "grouped_map_normalize",
    "minmax_normalize_window",
    # -- block B: last scored r3 — oldest first -----------------------------
    "corpus_chunking",
    "corpus_dataset_split",
    "corpus_pii_redact",
    "corpus_stratified_sample",
    "corpus_token_pack",
    "agg_cube",
    "agg_grouping_sets",
    "agg_filtered",
    "agg_exact_median",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_pivot",
    "agg_unpivot",
    "func_string",
    "func_math",
    "func_datetime",
    "func_arrays",
    "func_hof",
    "fuzzy_match_names",
    "fuzzy_match_names_indel",
    "sql_q6",
    "sql_scalar_subquery",
    "sql_correlated_subquery",
    "sql_q04_exists",
    "multimodal_media_meta",
    "join_salted",
    "join_bucketed",
    "window_analytics",
    "vector_l2_topk",
    "distinct_agg",
    "storage_csv_roundtrip",
    "wallet_features",
    # -- block C: r4-scored TPC-H battery (still fresher than block B) ------
    "q07_volume_shipping",
    "q08_market_share",
    "q09_nation_profit",
    "q10_returned_revenue",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
]


def load_all() -> dict[str, tuple[SparkQuery, str | None]]:
    """Import every query module (side-effect: registration) and return
    the merged registry, priority entries first."""
    from cyrela_etl_spark.queries import (  # noqa: F401
        functionsq,
        multimodalq,
        relational,
        storageq,
        streamingq,
        temporalq,
        textq,
        tpchx,
        vectorq,
        walletq,
    )

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, v) for n, v in REGISTRY.items() if n not in ordered)
    return ordered
