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

Cache contract (the persist/release discipline — VERDICT r8 item 6):
registry callables and the operators under them may ``persist()``
intermediates that BACK the returned lazy DataFrame (iterative edge
tables, self-joined posting lists, multi-consumer key sets — each site
carries a ``# release:`` marker naming its release point). Those frames
cannot be unpersisted before return: the caller has not acted on the
plan yet, and releasing early would re-run the iterative work at action
time. Release is therefore the CALLER's: consume the returned DataFrame,
then ``spark.catalog.clearCache()`` (what bench.py and both correctness
harnesses do between queries). Long-lived sessions embedding these
operators without clearing the cache will accumulate MEMORY_AND_DISK
blocks — spillable, bounded by the storage fraction, but not free.
Sessions with CONCURRENT consumers, where a global clear would drop
caches another query still needs, should release per-plan instead:
``cyrela_etl_spark.cache.release_plan_caches(df)`` uncaches exactly the
frames (transitively) backing one returned DataFrame.
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
# order and scores AT MOST ~50 entries per round. Round-13 slot allocation
# (VERDICT r12 items 1/4: drain driver freshness to r8+, re-score the
# entry whose code changes this round):
#   code-changed (4): graph_kcore_peel — degree-table plan diet (one deg
#     agg per round feeds both the stats row and the keep-set; 20 -> 16
#     shuffle sites, BNLJ gone); storage_txn_acid — the commit/append
#     pre-check moved from an O(chain) manifest listing to two O(1)
#     existence probes and vacuum's delete loop was de-quadraticized
#     (both caught by tools/scale_curve_txn_vacuum.py);
#     graph_lpa_communities — final labels persisted (two consumers each
#     re-planned the whole unrolled iteration; 17 -> 11 shuffle sites);
#     vector_cluster_quality — the final k-row centroid table persisted
#     (three consumers each re-planned the corpus-scale means aggregate;
#     11 -> 6 shuffle sites); graph_degree_distribution — edge set +
#     histogram persisted (the symmetrizing union recomputed the corpus
#     self-join; 8 -> 3 shuffle sites); vector_label_margin — sample +
#     pair set persisted (the corpus window ran three times, the pair
#     join twice; 8 -> 3 shuffle sites). code-changed is 6 total (label
#     margin was already queued in the r8-era block and just moves up).
#   r7-era (14): the whole remaining cohort whose latest driver green is
#     the round-7 row — the cohort's simplest plans over since-untouched
#     code (VERDICT r12 item 1 names exactly this list); after this round
#     no entry's latest driver score predates r8.
#   r8-era (30 of 48): the round-8 cohort complex-first — recursive CTE,
#     the streaming outer interval join, the graph/vector/text/dedup
#     analysis entries, storage round-trips, events battery. 6 + 14 + 30
#     = 50. The 17 r8-era entries left out (agg_basket_lift, agg_bool,
#     agg_listagg, agg_regression_slope, func_bitwise, func_try_safe,
#     join_null_safe, set_ops_all, window_ignore_nulls,
#     window_time_range_frame, events_heatmap_drift, events_peak_days,
#     events_seasonality, events_stickiness, events_new_vs_returning,
#     events_type_diversity, temporal_week_over_week) are that cohort's simplest plans; they
#     head round 14's queue.
_PRIORITY: list[str] = [
    # -- code changed in round 13: stale green, must re-score ---------------
    "graph_kcore_peel",  # degree-table plan diet (VERDICT r12 item 4)
    "storage_txn_acid",  # O(1) commit pre-check + vacuum de-quadratic (item 5)
    "graph_lpa_communities",  # final-labels persist diet (17 -> 11 sites)
    "vector_cluster_quality",  # k-row centroid persist diet (11 -> 6 sites)
    "graph_degree_distribution",  # edge-set + histogram persist (8 -> 3 sites)
    "vector_label_margin",  # sample + pair-set persist (8 -> 3 sites)
    # -- r7-era rows (oldest greens left in the registry) --------------------
    "agg_mode",
    "agg_weighted_median",
    "temporal_ewma",
    "temporal_interpolate",
    "text_url_extraction",
    "text_readability",
    "ml_feature_hash",
    "ml_target_encode",
    "multimodal_mp3_meta",
    "storage_moments_profile",
    "storage_winsorize_profile",
    "storage_correlation_profile",
    "storage_integrity_checksum",
    "sql_lateral_topn",
    # -- r8-era rows, complex-first (30 of 48) -------------------------------
    "sql_recursive_cte",
    "stream_interval_join_outer",
    "graph_assortativity",
    "graph_triangle_stats",
    "vector_kcenter_select",
    "vector_knn_classify",
    "vector_norm_profile",
    "text_bm25_topk",
    "text_bpe_pair_stats",
    "text_language_confusion",
    "text_ngram_novelty",
    "text_rake_keywords",
    "dedup_impact_report",
    "dedup_minhash_calibration",
    "corpus_dataset_card",
    "multimodal_media_meta",
    "quality_filter_agreement",
    "storage_csv_dialect",
    "storage_hive_partition_roundtrip",
    "storage_nested_json_flatten",
    "storage_orc_roundtrip",
    "temporal_asof_forward",
    "temporal_calendar_dim",
    "temporal_concurrency_curve",
    "temporal_session_window_native",
    "events_alert_debounce",
    "events_anomaly_zscore",
    "events_first_touch",
    "events_forecast_backtest",
    "events_gap_magnitude_histogram",
]


def load_all() -> dict[str, tuple[SparkQuery, str | None]]:
    """Import every query module (side-effect: registration) and return
    the merged registry, priority entries first."""
    from cyrela_etl_spark.queries import (  # noqa: F401
        functionsq,
        mlprepq,
        multimodalq,
        relational,
        round8q,
        storageq,
        streamingq,
        temporalq,
        textq,
        tpch2,
        tpchx,
        vectorq,
        walletq,
    )

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, v) for n, v in REGISTRY.items() if n not in ordered)
    return ordered
