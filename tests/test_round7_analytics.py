"""Round-7 analytics operators: retention cohorts, Markov transitions,
EWMA fold. Registry entries are oracle-checked; these tests pin the
contracts the oracle can't see: hand-computed recurrence values, plan
shapes (broadcast of tiny aggregates, no nested-loop joins), and the
offset-0 retention identity.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(minute: int):
    return datetime.datetime(2026, 1, 5, 12, minute)


# ---------------------------------------------------------------------------
# temporal_ewma
# ---------------------------------------------------------------------------
def test_ewma_recurrence_hand_computed(spark, monkeypatch):
    from cyrela_etl_spark.queries import temporalq

    tiny = spark.createDataFrame(
        [
            (1, _ts(0), 101, 10.0),
            (1, _ts(1), 102, 20.0),
            (1, _ts(2), 103, 30.0),
            (2, _ts(0), 201, 7.5),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    monkeypatch.setattr(temporalq, "_events", lambda spark, sf_dir: tiny)
    rows = {r["user_id"]: r for r in temporalq.temporal_ewma(spark, SF).collect()}
    # e1=10; e2=.2*20+.8*10=12; e3=.2*30+.8*12=15.6
    assert rows[1]["ewma_value"] == 15.6
    assert rows[1]["n_events"] == 3
    # single-event user: ewma is the value itself (the fold's seed)
    assert rows[2]["ewma_value"] == 7.5


def test_ewma_ignores_input_row_order(spark, monkeypatch):
    """The fold must order by (ts, event_id), not arrival order."""
    from cyrela_etl_spark.queries import temporalq

    shuffled = spark.createDataFrame(
        [
            (1, _ts(2), 103, 30.0),
            (1, _ts(0), 101, 10.0),
            (1, _ts(1), 102, 20.0),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    ).repartition(4)
    monkeypatch.setattr(temporalq, "_events", lambda spark, sf_dir: shuffled)
    [row] = temporalq.temporal_ewma(spark, SF).collect()
    assert row["ewma_value"] == 15.6


# ---------------------------------------------------------------------------
# events_markov_transitions
# ---------------------------------------------------------------------------
def test_markov_counts_and_probs(spark, monkeypatch):
    from cyrela_etl_spark.queries import temporalq

    seq = spark.createDataFrame(
        [
            (1, _ts(0), 1, "A"),
            (1, _ts(1), 2, "B"),
            (1, _ts(2), 3, "A"),
            (1, _ts(3), 4, "B"),
            (2, _ts(0), 5, "A"),
            (2, _ts(1), 6, "A"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    monkeypatch.setattr(temporalq, "_events", lambda spark, sf_dir: seq)
    out = {
        (r["from_type"], r["to_type"]): r
        for r in temporalq.events_markov_transitions(spark, SF).collect()
    }
    assert out[("A", "B")]["n_transitions"] == 2
    assert out[("B", "A")]["n_transitions"] == 1
    assert out[("A", "A")]["n_transitions"] == 1
    # from A: 2/3 to B, 1/3 to A; last event of each user emits nothing
    assert out[("A", "B")]["prob"] == round(2 / 3, 6)
    assert out[("A", "A")]["prob"] == round(1 / 3, 6)
    assert out[("B", "A")]["prob"] == 1.0


def test_markov_totals_join_is_broadcast(spark):
    from cyrela_etl_spark.queries.temporalq import events_markov_transitions

    plan = _plan(events_markov_transitions(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# events_retention_cohorts
# ---------------------------------------------------------------------------
def test_retention_offset_zero_is_full_cohort(spark):
    from cyrela_etl_spark.queries.temporalq import events_retention_cohorts

    rows = events_retention_cohorts(spark, SF).collect()
    assert rows, "retention matrix must be non-empty"
    zero = [r for r in rows if r["week_offset"] == 0]
    assert zero, "every cohort has an offset-0 row"
    for r in zero:
        # by construction a user is active in their own first week
        assert r["n_active"] == r["cohort_size"]
        assert r["retention"] == 1.0
    for r in rows:
        assert 0 < r["retention"] <= 1.0
        assert r["week_offset"] >= 0


def test_retention_sizes_join_is_broadcast(spark):
    from cyrela_etl_spark.queries.temporalq import events_retention_cohorts

    plan = _plan(events_retention_cohorts(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
