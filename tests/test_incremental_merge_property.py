"""Hypothesis algebraic pins for the incremental-aggregate state
(operators/incremental.py): on random batches with overlapping keys, the
merge must be ASSOCIATIVE and COMMUTATIVE (any merge-tree shape and any
batch order finalize to identical rows), a single-batch state must
finalize to the direct aggregate, and keys absent from some batches must
merge correctly. The storage_incremental_agg query model checks one
fixed 3-batch split against a full recompute; these pin the algebra
itself, which is what makes the O(|delta|) maintenance claim safe at any
partitioning.
"""

from __future__ import annotations
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ROW = st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-500, 500))
_BATCH = st.lists(_ROW, min_size=1, max_size=6)
_BATCHES = st.lists(_BATCH, min_size=2, max_size=4)


def _state(spark, batch):
    from cyrela_etl_spark.operators.incremental import partial_agg_state

    rows = [(k, v / 100.0) for k, v in batch]
    df = spark.createDataFrame(rows, "k string, value double")
    return partial_agg_state(df, ["k"], "value")


def _final_rows(state):
    from cyrela_etl_spark.operators.incremental import finalize_agg_state

    return {
        r["k"]: (r["n"], r["total"], r["avg_value"], r["min_value"], r["max_value"])
        for r in finalize_agg_state(state, ["k"]).collect()
    }


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(batches=_BATCHES)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_merge_is_order_and_tree_shape_invariant(spark, batches):
    from cyrela_etl_spark.operators.incremental import merge_agg_states

    states = [_state(spark, b) for b in batches]
    flat = _final_rows(merge_agg_states(states, ["k"]))
    reversed_order = _final_rows(merge_agg_states(states[::-1], ["k"]))
    nested = states[0]
    for s in states[1:]:
        nested = merge_agg_states([nested, s], ["k"])  # left-deep pairwise tree
    assert flat == reversed_order == _final_rows(nested)
    # and the merged state equals the direct aggregate over all rows
    direct = _final_rows(_state(spark, [r for b in batches for r in b]))
    assert flat == direct


@given(batch=_BATCH)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_single_state_finalizes_to_direct_aggregate(spark, batch):
    from decimal import ROUND_HALF_UP, Decimal

    got = _final_rows(_state(spark, batch))
    want = {}
    for k in {k for k, _ in batch}:
        vals = [v / 100.0 for kk, v in batch if kk == k]
        # the state sums as DECIMAL(18,2) and casts to double once
        total = float(
            sum(Decimal(repr(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
                for v in vals)
        )
        want[k] = (len(vals), total, total / len(vals), min(vals), max(vals))
    assert got == want
