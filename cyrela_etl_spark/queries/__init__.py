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
# order and scores AT MOST ~50 entries per round. Round-12 slot allocation
# (VERDICT r11 items 2/3/5: drain driver freshness to r7+, re-score the
# two entries whose code changes this round):
#   code-changed (2): storage_txn_acid — the r11 +38% wall regression is
#     being A/B-isolated and the entry needs a fresh green at
#     r10-comparable wall (VERDICT r11 item 2); vector_power_iteration_pca
#     — the registry-heaviest plan (23 shuffle / 31 broadcast / 24 scan
#     sites) gets a persist-and-reuse diet pass (item 5).
#   r6-era (13): the whole remaining cohort whose latest driver green is
#     the round-6 row — judge pre-verified all 13 green in the round-11
#     session, so this is pure bookkeeping; after this round no entry's
#     latest driver score predates r7.
#   r7-era (35 of 49): the round-7 cohort complex-first — the two
#     streaming drains (side-effectful, heaviest), the graph family,
#     vector/kmeans, the events battery, text indexing, dedup, corpus,
#     scale sketches, storage lifecycle, quality, temporal SCD/CUSUM.
#     2 + 13 + 35 = 50. The 14 r7-era entries left out (agg_mode,
#     agg_weighted_median, temporal_ewma, temporal_interpolate,
#     text_url_extraction, text_readability, ml_feature_hash,
#     ml_target_encode, multimodal_mp3_meta, storage_moments_profile,
#     storage_winsorize_profile, storage_correlation_profile,
#     storage_integrity_checksum, sql_lateral_topn) are the cohort's
#     simplest plans over since-untouched code; they head round 13's
#     queue.
_PRIORITY: list[str] = [
    # -- code changed in round 12: stale green, must re-score ---------------
    "storage_txn_acid",  # r11 +38% A/B isolation (VERDICT r11 item 2)
    "vector_power_iteration_pca",  # plan diet (VERDICT r11 item 5)
    # -- r6-era rows (oldest greens left in the registry) --------------------
    "events_funnel",
    "func_json_extract",
    "minmax_normalize_window",
    "quality_classifier_filter",
    "temporal_time_bucket",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_cube",
    "agg_exact_median",
    "agg_filtered",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_unpivot",
    # -- r7-era rows, complex-first (35 of 49) -------------------------------
    "stream_dedup_expiry",
    "stream_window_topk",
    "graph_lpa_communities",
    "graph_pagerank",
    "graph_link_prediction",
    "vector_kmeans_clusters",
    "vector_matryoshka_topk",
    "vector_recall_report",
    "text_tfidf_doc_pairs",
    "text_positional_index",
    "text_pmi_collocations",
    "text_phrase_search",
    "events_attribution",
    "events_markov_transitions",
    "events_retention_cohorts",
    "events_rfm_segments",
    "events_rolling_active_users",
    "events_sequence_trigrams",
    "events_ab_test",
    "events_anomaly_mad",
    "events_bot_regularity",
    "dedup_containment_pairs",
    "dedup_keep_best",
    "corpus_domain_mix",
    "corpus_dsir_weights",
    "scale_bloom_prefilter",
    "scale_countmin_estimate",
    "scale_join_cardinality",
    "storage_forget_user",
    "storage_equidepth_histogram",
    "storage_schema_evolution",
    "quality_gopher_rules",
    "quality_perplexity_buckets",
    "temporal_scd2_intervals",
    "temporal_cusum_drift",
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
