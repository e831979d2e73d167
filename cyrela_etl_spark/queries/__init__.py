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
# round 5 (96 registered queries, all oracle-backed):
#   block A (10): queries whose round-4 code changes were never
#     driver-scored (VERDICT r4 "stale greens") — re-score first;
#   block B (20): queries green in r4 whose implementing files changed
#     in round 5 (dedup.py empty-shingle filter, textq.py term-stats
#     rewrite + oracle tweaks, streaming/ops.py checkpoint/view cleanup,
#     zones.py compaction swap) — their r4 rows describe old code;
#   block C: everything unscored in r4, oldest-risk first (relational
#     battery, then wallet) — the tail past slot 50 keeps valid r3 rows
#     over files untouched in rounds 4 AND 5 (functionsq.py, corpus.py,
#     temporalq.py), which is the safest thing to leave unscored.
_PRIORITY: list[str] = [
    # -- block A: round-4 stale greens (VERDICT r4 item 1) ------------------
    "dedup_components",
    "multimodal_byte_histogram",
    "multimodal_frame_sample",
    "vector_cosine_topk",
    "vector_rhp_lsh_topk",
    "vector_ivf_topk",
    "vector_neardup_pairs",
    "text_term_stats",
    "curation_pipeline",
    "dedup_ngram_jaccard",
    # -- new in round 5 (never scored) --------------------------------------
    "q15_top_supplier",
    "q21_waiting_supplier",
    "text_repetition",
    "stream_interval_join",
    "storage_incremental_agg",
    # -- block B: implementing file changed in round 5 ----------------------
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "text_quality",
    "text_language_id",
    "text_fingerprint",
    "text_token_counts",
    "text_winnow_fingerprints",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_stateful_running",
    "stream_static_enrich",
    "stream_parquet_sink",
    "storage_zone_promote",
    "storage_table_roundtrip",
    "storage_snapshot_diff",
    # -- block C: r4-unscored (valid r3 rows, code unchanged since) ---------
    "q01_pricing_summary",
    "q03_top_orders",
    "q05_region_revenue",
    "join_semi",
    "join_anti",
    "join_outer",
    "join_broadcast_dim",
    "window_rank",
    "window_lag_running",
    "window_frames",
    "set_ops",
    "set_intersect",
    "group_rollup",
    "filter_project",
    "topk_global",
    "distinct_agg",
    "sql_q04_exists",
    "q12_priority_shipping",
    "q14_promo_revenue",
    "wallet_features",
    # ---- slot ~50 boundary: entries below keep r3 rows over files
    # ---- untouched since (temporalq.py, corpus.py, functionsq.py)
    "temporal_gap_fill",
    "corpus_chunking",
    "corpus_dataset_split",
    "corpus_pii_redact",
    "corpus_token_pack",
    "agg_cube",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_pivot",
    "agg_unpivot",
    "func_json_extract",
    "func_string",
    "func_math",
    "func_datetime",
    "func_arrays",
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
