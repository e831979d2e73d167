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
# order and scores AT MOST ~50 entries per round. Round-11 slot allocation
# (VERDICT r10 item 1: freeze holds at 0 new operators; finish the
# aging-tail drain so NO registry entry's latest green predates round 6):
#   code-changed (2): storage_txn_acid — sources/txn.py gained append
#     schema-on-write enforcement this round; dedup_minhash_lsh — the
#     verification joins were re-planned (candidate-side shuffle_hash
#     build instead of merge-sorting the shingle relation twice; 5
#     shuffle sites -> 3, pinned in tests/test_plan_budget.py). Both
#     r10 greens are stale.
#   r5-era (16): every remaining entry whose latest green is the round-5
#     row — the simple-plan tail the r10 queue deliberately deferred
#     (filter_project .. text_token_counts below).
#   r6-era (33 of 45): the round-6 cohort complex-first — all eight
#     streaming drains (side-effectful, heaviest), the vector
#     quantization family, contamination, the temporal battery, the
#     corpus curation ops, storage profiling/roundtrip, and the
#     remaining heavy singles; spill-risk ordering puts the simplest
#     last. 2 + 16 + 32 = 50. The 13 r6-era entries left out
#     (agg_filtered, agg_cube, agg_grouping_sets, agg_pivot,
#     agg_unpivot, agg_exact_median, agg_approx_distinct,
#     agg_approx_percentile, func_json_extract, minmax_normalize_window,
#     temporal_time_bucket, quality_classifier_filter, events_funnel —
#     the last yielded its slot to the dedup_minhash_lsh re-plan) are
#     the cohort's simplest plans over since-untouched code; their r6
#     greens already satisfy the no-green-predates-r6 bar and they head
#     round 12's queue.
_PRIORITY: list[str] = [
    # -- code changed in round 11: stale green, must re-score ---------------
    "storage_txn_acid",
    "dedup_minhash_lsh",  # verify-join re-plan (SMJ sorts -> cand-side SHJ)
    # -- r5-era rows (oldest greens left in the registry) -------------------
    "q01_pricing_summary",
    "q03_top_orders",
    "topk_global",
    "filter_project",
    "set_ops",
    "set_intersect",
    "join_anti",
    "join_semi",
    "join_outer",
    "join_broadcast_dim",
    "group_rollup",
    "window_rank",
    "window_frames",
    "window_lag_running",
    "text_term_stats",
    "text_token_counts",
    # -- r6-era rows, complex-first (33 of 45) ------------------------------
    "stream_stateful_running",
    "stream_session",
    "stream_sliding",
    "stream_tumbling",
    "stream_dedup",
    "stream_interval_join",
    "stream_static_enrich",
    "stream_parquet_sink",
    "storage_jsonl_badrecords",
    "storage_jsonl_roundtrip",
    "vector_semdedup_pairs",
    "vector_pq_adc_topk",
    "vector_sq_int8_topk",
    "dedup_contamination",
    "temporal_asof_join",
    "temporal_range_join",
    "temporal_sessionize",
    "temporal_ohlc",
    "temporal_gap_fill",
    "corpus_pii_redact",
    "corpus_boilerplate_removal",
    "corpus_stratified_sample",
    "corpus_weighted_sample",
    "corpus_dataset_split",
    "corpus_token_pack",
    "corpus_chunking",
    "storage_zorder_cluster",
    "storage_histogram_drift",
    "storage_numeric_profile",
    "scale_skew_profile",
    "grouped_map_normalize",
    "text_lm_score",
    # events_funnel yielded its slot to dedup_minhash_lsh (code-changed
    # round 11); its r6 green still satisfies the freshness bar and it
    # joins the round-12 queue head with the other 13 r6-era leftovers.
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
