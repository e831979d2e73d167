"""Per-query shuffle-site budgets — the regression gate the de-inflated
plan counters enable (VERDICT r10 item 5: "so the artifact can gate
regressions").

Each entry pins the number of DISTINCT shuffle-exchange sites (formatted
explain; a reused exchange counts once) a headline query's plan may
contain, at the value measured for the round-11 PLAN_REPORT.md. A plan
edit that adds a shuffle site fails here and must either remove the
shuffle or consciously raise the budget with a justification — exactly
how the BNLJ allowlist keeps join quality honest. Budgets are an upper
bound, and a plan that comes in UNDER budget also fails (stale pin), so
the numbers in this file always state the true structure.

wallet_features' budget of ZERO is the strongest pin: the 23→34-column
feature chain with its 9 global-max rescales runs as one scan + one
1-row broadcast — any regression that introduces a shuffle into the
reference's flagship pipeline is a 100 TB cliff.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from plan_report import plan_stats  # noqa: E402

SF = "/root/testdata/sf0.001"

# query -> exact distinct shuffle-site count (PLAN_REPORT.md, round 11)
SHUFFLE_BUDGET = {
    # flagship wallet chain: scan + broadcast only, NO shuffle
    "wallet_features": 0,
    # embedding collapse blocks on broadcast centroids/components
    "vector_semdedup_pairs": 0,
    # single-agg relational representatives
    "q01_pricing_summary": 1,
    "q05_region_revenue": 1,
    "text_zipf_fit": 1,
    "vector_ivf_topk": 1,
    # multi-stage pipelines
    "curation_pipeline": 2,
    "dedup_contamination": 3,
    # verify joins re-planned round 11 (candidate-side shuffle_hash +
    # AQE-planned second join): 5 sites -> 3 (the two SMJ sort-exchange
    # pairs collapsed)
    "dedup_minhash_lsh": 3,
    # r14 tail diet: budgets persisted (6 -> 5)
    "corpus_curriculum_stages": 5,
    # r12 persist diet (VERDICT r11 item 5): E + per-round s + w2 cached,
    # 23 sites -> 5 (one dr + one s agg per round, one final λ agg)
    "vector_power_iteration_pca": 5,
    # iterative graph plans: per-round distinct sites (the rows the old
    # textual counters inflated to 33-180)
    "graph_pagerank": 10,
    # r13 diet: final labels persisted (two consumers — the size agg and
    # the output join — each re-planned the whole unrolled iteration).
    # r18 re-pin 11 -> 8: the symmetrized edge table is localCheckpointed
    # (operators/graph.py — per-reference planning of the edge-build
    # subtree was ~1 s of a 4 s wall; A/B −22%), so the final plan starts
    # at the checkpointed blocks and the edge build's 3 sites (posting
    # agg, kept join, pair self-join) run at checkpoint time instead of
    # appearing here. Structure above the checkpoint is unchanged.
    "graph_lpa_communities": 8,
    # r13 degree-table diet: ONE deg agg per round feeds both the stats
    # row (n_nodes = count, n_edges = sum(deg)/2) and the next keep-set;
    # the per-round distinct-nodes shuffle + 1-row edge-count broadcast
    # join are gone (20 -> 16 sites; bcast 5 -> 2; BNLJ 1 -> 0). r14:
    # degrees() now explodes array(id_a, id_b) instead of unioning two
    # selects, so each edge set is consumed ONCE — the final peel's
    # double-planned induce join disappears (16 -> 12)
    "graph_kcore_peel": 12,
}


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_shuffle_site_budget(spark, name):
    from cyrela_etl_spark.queries import load_all

    fn, _oracle = load_all()[name]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    # Hermetic cold-plan measurement: a cache MATERIALIZED by an earlier
    # test (e.g. the model-check witnesses collect these same queries)
    # truncates the formatted explain at the InMemoryTableScan, deflating
    # the site count below the cold pin (r13: kcore read 12 after the
    # graph model test vs 16 cold). Clear BEFORE building so the pin
    # always measures the same cold plan PLAN_REPORT.md records.
    spark.catalog.clearCache()
    formatted = fn(spark, SF)._jdf.queryExecution().explainString(mode)
    spark.catalog.clearCache()
    got = plan_stats(formatted)["shuffles"]
    budget = SHUFFLE_BUDGET[name]
    assert got <= budget, (
        f"{name} plans {got} distinct shuffle sites, budget {budget} — "
        "remove the new exchange or justify raising the budget"
    )
    assert got == budget, (
        f"{name} now plans {got} shuffle sites, under its budget {budget} — "
        "re-pin the budget so the gate stays tight"
    )
