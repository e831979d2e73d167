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
# order and scores AT MOST ~50 entries per round. Round-14 slot allocation
# (VERDICT r13 items 1/6 + this round's diet sweep):
#   r8-era (17): the final freshness drain — the last entries whose latest
#     driver green is the round-8 row (VERDICT r13 item 1 names exactly
#     this list; after this round no entry's latest green predates r9).
#   code-changed (34): storage_txn_acid — the txn layer gained the
#     read_version=0 vacuum-fork fix (ADVICE r13 medium) and the
#     listing-based vacuum (manifest bytes O(keep·N), was O(N^2));
#     graph_kcore_peel — degrees() now explodes array(id_a, id_b) instead
#     of a union of two selects (each edge set consumed once; 16 -> 12
#     shuffle sites) and n_edges uses integral div; and 32 persist diets
#     from the AUTOMATED multi-consumer-tail sweep (tools/tail_detector.py,
#     VERDICT r13 item 3): the detector found every registry query whose
#     optimized plan carries skeleton-identical, canonically-diverged
#     copies of a heavy subtree (runtime exchange reuse cannot merge
#     those) that the analyzed plan confirms are one variable consumed
#     >= 2x un-persisted. Every flagged relation is now persisted at its
#     definition (k-row or cache-contract-bounded; release: caller), the
#     registry-wide gate in tests/test_plan_sweep.py pins flags == 0, and
#     tests/test_plan_quality.py seeds a regression. 17 + 34 = 51: one
#     over the nominal ~50 — ordered so the tail entry is the least
#     plan-changed diet (a 4-row matrix persist with a pytest twin).
_PRIORITY: list[str] = [
    # -- r8-era rows (the oldest greens left; VERDICT r13 item 1) -----------
    "agg_basket_lift",  # also r14 diet: li persisted (4 consumers)
    "agg_bool",
    "agg_listagg",
    "agg_regression_slope",
    "func_bitwise",
    "func_try_safe",
    "join_null_safe",
    "set_ops_all",
    "window_ignore_nulls",
    "window_time_range_frame",
    "events_heatmap_drift",
    "events_peak_days",
    "events_seasonality",  # also r14 diet: cells persisted
    "events_stickiness",
    "events_new_vs_returning",
    "events_type_diversity",
    "temporal_week_over_week",
    # -- code changed in round 14: stale green, must re-score ---------------
    "storage_txn_acid",  # init-after-vacuum conflict + listing-based vacuum
    "graph_kcore_peel",  # explode-degrees (16 -> 12 sites) + integral div
    "q02_min_cost_supplier",  # eligible persisted (min-cost join pattern)
    "q11_important_parts",  # per_part persisted
    "q15_top_supplier",  # revenue view persisted (scan+shuffle ran twice)
    "ml_woe_iv",  # feats + scored persisted
    "ml_target_encode",  # per_seg persisted
    "ml_class_weights",  # per_label persisted
    "graph_bfs_frontier",  # hop1 persisted (3 consumers)
    "graph_link_prediction",  # mid persisted (both wedge sides)
    "graph_assortativity",  # deg persisted (both endpoint joins)
    "corpus_temperature_mix",  # per_lang + p persisted
    "corpus_epoch_plan",  # per_src persisted
    "corpus_domain_mix",  # counts + kept persisted
    "corpus_curriculum_stages",  # budgets persisted (6 -> 5 sites)
    "corpus_dsir_weights",  # stats persisted
    "text_term_stats",  # tf persisted
    "text_pmi_collocations",  # c1 + c2 persisted
    "text_rake_keywords",  # member + phr persisted
    "text_language_confusion",  # cells persisted
    "dedup_minhash_calibration",  # side persisted (both candidate sides)
    "events_anomaly_mad",  # operator diet: dev persisted
    "events_funnel_conversion_time",  # firsts persisted (self-join sides)
    "events_gap_magnitude_histogram",  # cells persisted
    "events_markov_transitions",  # trans persisted
    "events_retention_cohorts",  # cohort persisted
    "events_rfm_segments",  # users persisted
    "temporal_cusum_drift",  # daily persisted
    "storage_histogram_drift",  # operator diet: edges + cohort hists
    "scale_skew_profile",  # operator diet: counts persisted
    "scale_partition_balance",  # hist persisted
    "quality_filter_agreement",  # cells persisted (4-row matrix)
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
