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
# order and scores AT MOST ~50 entries per round. Round-18 slot allocation
# (VERDICT r17 item 9 + ADVICE r17: changed rows must sit INSIDE the ~50
# scoring window, and the header must describe the list that exists):
#   code-changed (11), first so a short sample still re-scores them:
#     - dedup_components / dedup_keep_best / graph_component_sizes — the
#       connected-components loop now disables AQE for its rounds
#       (operators/dedup.py, r18): execution changes at EVERY SF.
#     - wallet_features, text_term_stats, text_zipf_fit,
#       corpus_token_pack, vector_ivf_topk, vector_rhp_lsh_topk — r18
#       fan_out decisions (wallet newly fanned; the other five opted
#       out). At the sf0.01 scoring SF all six tables sit below
#       fan_out's 512 KB floor, so the scoring plans are byte-identical
#       to the last green — staged anyway, conservatively.
#     - storage_txn_acid, storage_forget_user — their r17 code changes
#       (sources/txn.py VacuumReport) were staged at positions 54-55
#       last round and the driver's 50-row sample never reached them
#       (ADVICE r17 medium): still unscored since the change, so they
#       lead this round's drain.
#   r11-era drain (24): EVERY entry whose latest green driver row is
#     still round-11 (recomputed from the union of CORRECTNESS_r01..r17;
#     histogram at r18 staging: r11:24, r12:31, r13:36, r14:41, r15:36,
#     r16:38, r17:50). The r17 staging led with that round's 53 changed
#     rows, so its planned r11 drain never got scoring slots; finishing
#     it comes before starting the r12 drain.
#   r12-era padding (15): the sample size floats (~35-50 by round), so
#     the tail is the start of the NEXT drain — 15 of the 31 r12-latest
#     rows, family-spread (agg/approx-agg x4, events x3, window-norm,
#     quality x2, sketch x2, storage-schema, temporal-SCD2, vector-ANN).
#     If the driver scores fewer than 50, only padding is lost — every
#     code-changed and r11 row sits ahead. Total 11 + 24 + 15 = 50.
_PRIORITY: list[str] = [
    # -- round 18 OPTIMIZATION: code-changed rows first.
    "dedup_components",
    "dedup_keep_best",
    "graph_component_sizes",
    "wallet_features",
    "text_term_stats",
    "text_zipf_fit",
    "corpus_token_pack",
    "vector_ivf_topk",
    "vector_rhp_lsh_topk",
    "storage_txn_acid",
    "storage_forget_user",
    # -- r11-latest drain (all 24):
    "corpus_dataset_split",
    "corpus_pii_redact",
    "corpus_stratified_sample",
    "corpus_weighted_sample",
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
    "stream_parquet_sink",
    "stream_session",
    "stream_static_enrich",
    "temporal_gap_fill",
    "temporal_ohlc",
    "temporal_range_join",
    "temporal_sessionize",
    "text_token_counts",
    "window_frames",
    "window_lag_running",
    # -- r12-latest padding (15 of 31, family-spread):
    "agg_approx_distinct",
    "agg_cube",
    "agg_exact_median",
    "agg_pivot",
    "events_ab_test",
    "events_funnel",
    "events_rolling_active_users",
    "minmax_normalize_window",
    "quality_classifier_filter",
    "quality_perplexity_buckets",
    "scale_bloom_prefilter",
    "scale_countmin_estimate",
    "storage_schema_evolution",
    "temporal_scd2_intervals",
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
