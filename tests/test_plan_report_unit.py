"""Unit checks for tools/plan_report.py's formatted-explain parser — the
distinct-operator-site counters (VERDICT r10 item 5) and the balanced-
paren windowspecdefinition split (ADVICE r10). The synthetic-plan cases
pin the parsing contract; the live cases pin the property that motivated
the rework: a reused subtree counts ONCE, and an iterative plan's counts
reflect true structure, not print fan-out."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_report import _has_partitionless_spec, _sections, _spec_args, plan_stats  # noqa: E402


def test_spec_args_split_at_top_level_commas_only():
    seg = "coalesce(a#1, b#2), round(x#3, 2) ASC NULLS FIRST, specifiedwindowframe(RangeFrame, -3, 3))"
    assert _spec_args(seg) == [
        "coalesce(a#1, b#2)",
        "round(x#3, 2) ASC NULLS FIRST",
        "specifiedwindowframe(RangeFrame, -3, 3)",
    ]


@pytest.mark.parametrize(
    ("body", "want"),
    [
        # partitioned by a plain column: not partition-less
        ("windowspecdefinition(k#1, ts#2 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))", False),
        # no partition column at all
        ("windowspecdefinition(ts#2 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))", True),
        # ADVICE r10 case: leading sort EXPRESSION containing commas — the
        # old first-comma-segment heuristic saw "round(x#3" (no ASC/DESC)
        # and classified the spec as partitioned
        ("windowspecdefinition(round(x#3, 2) DESC NULLS LAST, specifiedwindowframe(RangeFrame, -3, 3))", True),
        # partition EXPRESSION containing commas: partitioned
        ("windowspecdefinition(coalesce(a#1, b#2), ts#2 ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))", False),
    ],
)
def test_partitionless_spec_detection(body, want):
    assert _has_partitionless_spec(body) is want


def test_sections_and_stats_over_synthetic_formatted_plan():
    formatted = """== Physical Plan ==
* HashAggregate (6)
+- Exchange (5)
   +- * HashAggregate (4)
      +- * Project (3)
         +- ReusedExchange (2)
            +- Scan parquet  (1)

(1) Scan parquet
Output [2]: [k#1, v#2]

(2) ReusedExchange [Reuses operator id: 5]
Output [2]: [k#1, v#2]

(3) Project
Input [2]: [k#1, v#2]

(4) HashAggregate
Input [2]: [k#1, v#2]

(5) Exchange
Input [2]: [k#1, v#2]
Arguments: hashpartitioning(k#1, 8), ENSURE_REQUIREMENTS, [plan_id=1]

(6) HashAggregate
Input [2]: [k#1, v#2]
"""
    names = [n for n, _ in _sections(formatted)]
    assert names == [
        "Scan parquet",
        "ReusedExchange [Reuses operator id: 5]",
        "Project",
        "HashAggregate",
        "Exchange",
        "HashAggregate",
    ]
    stats = plan_stats(formatted)
    # the ReusedExchange pointer is NOT a second shuffle site
    assert stats["shuffles"] == 1
    assert stats["scans"] == 1
    assert stats["bcast"] == stats["bnlj"] == stats["cartesian"] == 0


def test_live_self_join_counts_reused_scan_once(spark, sf_dir):
    """A self-aggregating join reuses one parquet scan on both sides; the
    distinct-site counter must report what .explain('formatted') numbers
    say, not the tree string's per-consumer re-expansion."""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    df = nation.alias("a").join(
        nation.alias("b"), on="n_regionkey", how="inner"
    )
    formatted = df._jdf.queryExecution().explainString(mode)
    stats = plan_stats(formatted)
    tree = df._jdf.queryExecution().executedPlan().toString()
    # however Catalyst shapes the join, the distinct-site scan count must
    # not exceed the textual count and must be at most the two sides
    assert 1 <= stats["scans"] <= 2
    assert stats["scans"] <= tree.count("FileScan") + tree.count("Scan parquet")
    assert stats["cartesian"] == 0
