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
# order and scores AT MOST ~50 entries per round. Round-15 slot allocation
# (VERDICT r14 item 1 — freshness drain):
#   r9-era (35): EVERY entry whose latest green driver row is still the
#     round-9 one. VERDICT r14 named a 44-row cohort (computed pre-r14);
#     the r14 sample itself re-scored 9 of them (diet overlaps), so 35
#     remain — recomputed from the union of CORRECTNESS_r01..r14. After
#     this round no entry's latest green predates r10. The whole cohort
#     was pre-verified green under a plain driver-emulating session at
#     sf0.01 in round 14 (NOTES pre-flight ledger, 44 ok / 0 fail).
#   code-changed (1): storage_txn_acid — sources/txn.py gained the
#     opt-in append compaction cadence (auto_compact_every=K, VERDICT r14
#     item 4), the vacuum min_age_sec guard and the init-conflict version
#     fix (ADVICE r15); green-path behavior is unchanged (both knobs
#     default off) but the changed module must re-score.
#   r10-era padding (15): the sample size floats (~35-50 by round), so the
#     tail is the start of the NEXT drain — 15 of the 46 r10-latest rows,
#     chosen to re-freshen one representative per heavy family (dedup,
#     fuzzy, vector, text, storage, multimodal, TPC-H join battery) rather
#     than alphabetically. If the driver scores fewer than 51, only
#     padding is lost — every r9 row and the code-changed row sit ahead.
#     No round-15 code change touches any padding entry (registry frozen
#     at 256). Total 35 + 1 + 15 = 51.
_PRIORITY: list[str] = [
    # -- r9-era rows (the oldest greens left; VERDICT r14 item 1) -----------
    "agg_entropy",
    "agg_percentile_cont",
    "corpus_quality_ablation",
    "corpus_token_length_histogram",
    "dedup_dup_ngram_fraction",
    "dedup_shingle_size_sensitivity",
    "distinct_agg",
    "events_conversion_wilson",
    "events_power_pareto",
    "func_arrays",
    "func_datetime",
    "func_maps",
    "func_math",
    "func_string",
    "func_struct_ops",
    "graph_component_sizes",
    "ml_leakage_check",
    "multimodal_duplicate_assets",
    "q12_priority_shipping",
    "q14_promo_revenue",
    "q16_part_supplier_counts",
    "q20_excess_shippers",
    "search_hybrid_rrf",
    "sql_q04_exists",
    "stream_bus_replay",
    "stream_upsert_sink",
    "temporal_asof_tolerance",
    "temporal_overlap_join",
    "text_hapax_heaps",
    "text_vocab_growth",
    "vector_centroid_shift",
    "vector_ivf_pq_topk",
    "vector_jl_projection",
    "wallet_features",
    "window_percent_rank_cume",
    # -- code changed in round 15: stale green, must re-score ---------------
    "storage_txn_acid",  # txn.py: auto_compact_every + vacuum age guard +
    #                      init-conflict version naming (ADVICE r15 fixes)
    # -- r10-era padding: head of the next drain, one per heavy family ------
    "dedup_exact",
    "dedup_components",
    "dedup_minhash_signatures",
    "dedup_simhash_pairs",
    "fuzzy_match_names",
    "join_bucketed",
    "join_salted",
    "multimodal_byte_histogram",
    "q05_region_revenue",
    "sql_q6",
    "storage_table_roundtrip",
    "text_language_id",
    "text_quality",
    "vector_cosine_topk",
    "window_analytics",
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
