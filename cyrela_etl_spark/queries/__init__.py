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
# order and scores AT MOST ~50 entries per round. Round-10 slot allocation
# (VERDICT r9 "next round" item 2: ZERO new operators — the freeze holds
# at 0/3 — and the budget goes to re-certifying the aging tail, oldest
# rows first, so no entry's latest driver row predates round 5):
#   code-changed (4): the entries whose implementing code changed this
#     round — corpus_curriculum_stages (re-planned off its global-order
#     window, r9 item 1), vector_exact_collapse (operator default now
#     exact-equality hashing, ADVICE r9), storage_txn_acid (publisher
#     extraction + upsert key-uniqueness guard, r9 item 4 + ADVICE), and
#     text_zipf_fit (top-30 moved from a full-vocabulary rank window to
#     two-phase TakeOrdered — the audit follow-up to item 1; value-
#     identical under the total order, plan pinned in
#     tests/test_plan_quality.py). Their r9 greens are stale; they go
#     FIRST.
#   r4-era (20): every still-registered entry whose latest green is the
#     round-4 row (the 21st r4 name, stream_rate_windowed, was retired/
#     renamed after r4 and no longer exists) — those rows predate the
#     harness clearCache fix, the ANSI-session emulation and three
#     rounds of shared helpers.
#   r5-era (26 of 42): the heavier/riskier part of the round-5 cohort
#     (dedup + vector + storage + multimodal + curation + the remaining
#     TPC-H + the text battery core), complex-first so any spill lands
#     on a simple entry.
#   4 + 20 + 26 = 50. text_token_counts (the previously-documented spill,
#   queued last) gives up its slot to the zipf re-score; it and the 15
#   r5-era entries left out (filter_project, topk_global, set_ops,
#   set_intersect, join_anti/semi/outer/broadcast_dim, group_rollup,
#   window_rank/frames/lag_running, q01_pricing_summary, q03_top_orders,
#   text_term_stats) hold valid r5 greens over since-untouched code and
#   are the simplest plans in the registry; they head round 11's queue.
_PRIORITY: list[str] = [
    # -- code changed in round 10: stale greens, must re-score --------------
    "corpus_curriculum_stages",
    "vector_exact_collapse",
    "storage_txn_acid",
    "text_zipf_fit",
    # -- r4-era rows (oldest in the registry) -------------------------------
    "func_hof",
    "fuzzy_match_names",
    "fuzzy_match_names_indel",
    "join_bucketed",
    "join_salted",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_nation_profit",
    "q10_returned_revenue",
    "q13_order_distribution",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    "sql_correlated_subquery",
    "sql_q6",
    "sql_scalar_subquery",
    "storage_csv_roundtrip",
    "vector_l2_topk",
    "window_analytics",
    # -- r5-era rows, complex-first ----------------------------------------
    "curation_pipeline",
    "dedup_minhash_lsh",
    "dedup_minhash_signatures",
    "dedup_components",
    "dedup_simhash_pairs",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "vector_rhp_lsh_topk",
    "vector_ivf_topk",
    "vector_neardup_pairs",
    "vector_cosine_topk",
    "multimodal_byte_histogram",
    "multimodal_frame_sample",
    "storage_zone_promote",
    "storage_snapshot_diff",
    "storage_incremental_agg",
    "storage_table_roundtrip",
    "q21_waiting_supplier",
    "q15_top_supplier",
    "q05_region_revenue",
    "text_winnow_fingerprints",
    "text_repetition",
    "text_quality",
    "text_language_id",
    "text_fingerprint",
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
