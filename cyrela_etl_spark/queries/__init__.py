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
# order and scores AT MOST ~50 entries per round. Round-17 slot allocation
# (VERDICT r16 item 1 — continue the freshness drain):
#   r11-era (32): EVERY entry whose latest green driver row is still the
#     round-11 one — the oldest greens left after the r16 scoring
#     (recomputed from the union of CORRECTNESS_r01..r16; judge's r16
#     histogram agrees: r11:32). After this round no entry's latest green
#     predates r12. Pre-verified green under a plain driver-emulating
#     session at sf0.01 this round (NOTES r17 pre-flight ledger).
#   code-changed (2): storage_txn_acid — sources/txn.py changed again
#     this round (vacuum returns a VacuumReport carrying swept_dirs/
#     spared_dirs so space reclamation is observable, ADVICE r16) — and
#     stream_dedup_expiry — its fixture cache gained the build lock,
#     stale-dir reclaim on failed revalidation, and all-dirs atexit
#     tracking (ADVICE r16); drain semantics and oracle unchanged, but
#     the changed queries must re-score.
#   r12-era padding (16): the sample size floats (~35-50 by round), so the
#     tail is the start of the NEXT drain — 16 of the 37 r12-latest rows,
#     one representative per heavy family (agg, approx-agg, dedup, events,
#     graph, window-norm, quality, bloom, join-cardinality, storage-GDPR,
#     schema-evolution, streaming, temporal-SCD2, text, vector-kmeans,
#     vector-ANN) rather than alphabetical. If the driver scores fewer
#     than 50, only padding is lost — every r11 row and both code-changed
#     rows sit ahead. No round-17 code change touches any padding entry
#     (registry frozen at 256). Total 32 + 2 + 16 = 50.
_PRIORITY: list[str] = [
    # -- r11-era rows (the oldest greens left; VERDICT r16 item 1) ----------
    "corpus_boilerplate_removal",
    "corpus_dataset_split",
    "corpus_pii_redact",
    "corpus_stratified_sample",
    "corpus_token_pack",
    "corpus_weighted_sample",
    "dedup_contamination",
    "group_rollup",
    "join_anti",
    "join_outer",
    "join_semi",
    "q03_top_orders",
    "set_intersect",
    "storage_jsonl_badrecords",
    "storage_jsonl_roundtrip",
    "storage_numeric_profile",
    "stream_dedup",
    "stream_interval_join",
    "stream_parquet_sink",
    "stream_session",
    "stream_sliding",
    "stream_static_enrich",
    "stream_tumbling",
    "temporal_gap_fill",
    "temporal_ohlc",
    "temporal_range_join",
    "temporal_sessionize",
    "text_token_counts",
    "vector_pq_adc_topk",
    "vector_sq_int8_topk",
    "window_frames",
    "window_lag_running",
    # -- code changed in round 17: stale green, must re-score ---------------
    "storage_txn_acid",  # txn.py: VacuumReport swept/spared observability
    "stream_dedup_expiry",  # streamingq.py: fixture-cache lock + stale reclaim
    # -- r12-era padding: head of the next drain, one per heavy family ------
    "agg_cube",
    "agg_approx_percentile",
    "dedup_containment_pairs",
    "events_funnel",
    "graph_pagerank",
    "minmax_normalize_window",
    "quality_gopher_rules",
    "scale_bloom_prefilter",
    "scale_join_cardinality",
    "storage_forget_user",
    "storage_schema_evolution",
    "stream_window_topk",
    "temporal_scd2_intervals",
    "text_tfidf_doc_pairs",
    "vector_kmeans_clusters",
    "vector_matryoshka_topk",
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
