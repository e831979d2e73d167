"""Round-7 wave: OLS regression aggregate, seasonality heatmap, bitwise
battery — hand-computed pins.
"""

from __future__ import annotations
import pytest

import datetime


def test_regression_perfect_line(spark, monkeypatch):
    from cyrela_etl_spark.queries import relational

    tiny = spark.createDataFrame(
        [("N", 1.0, 2.0), ("N", 2.0, 4.0), ("N", 3.0, 6.0), ("C", 5.0, 9.0)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    monkeypatch.setattr(
        relational, "_t", lambda spark, sf_dir, name: tiny if name == "lineitem" else None
    )
    rows = {r["l_returnflag"]: r for r in relational.agg_regression_slope(spark, "x").collect()}
    assert rows["N"]["slope"] == 2.0
    assert rows["N"]["intercept"] == 0.0
    assert rows["N"]["r2"] == 1.0
    # single-point group: zero variance on both axes -> dropped
    assert "C" not in rows


def test_seasonality_iso_weekday_mapping(spark, monkeypatch):
    from cyrela_etl_spark.queries import temporalq

    # 2026-04-06 is a Monday, 2026-04-12 a Sunday
    tiny = spark.createDataFrame(
        [
            (1, datetime.datetime(2026, 4, 6, 9, 0), 1, "t", 1.0),
            (2, datetime.datetime(2026, 4, 6, 9, 30), 2, "t", 1.0),
            (3, datetime.datetime(2026, 4, 12, 23, 0), 1, "t", 1.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    monkeypatch.setattr(temporalq, "_events", lambda spark, sf_dir: tiny)
    rows = {
        (r["iso_dow"], r["hour_of_day"]): r
        for r in temporalq.events_seasonality(spark, "x").collect()
    }
    assert rows[(1, 9)]["n_events"] == 2
    assert rows[(1, 9)]["share_ppm"] == 666666  # (1e6*2) div 3, truncating
    assert rows[(7, 23)]["n_events"] == 1
    assert rows[(7, 23)]["share_ppm"] == 333333


def test_bitwise_hand_computed(spark, tmp_path):
    from cyrela_etl_spark.queries.functionsq import func_bitwise

    orders = spark.createDataFrame(
        [(1, "O"), (2, "O"), (3, "O")], "o_orderkey long, o_orderstatus string"
    )
    orders.write.parquet(f"{tmp_path}/orders.parquet")
    row = func_bitwise(spark, str(tmp_path)).collect()[0]
    assert row["n_orders"] == 3
    assert row["or_low12"] == 3
    assert row["and_high"] == 4095
    assert row["xor_all"] == 1 ^ 2 ^ 3  # == 0
    assert row["total_bits"] == 4
    assert row["or_shifted"] == (1 << 8) | (2 << 8) | (3 << 8)


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
def test_recursive_cte_bfs_closed_form(spark, monkeypatch):
    """Next-3 ladder from the min key: BFS distance of offset k is
    ceil(k/3); depth bound 5 caps the frontier at seed+15."""
    from cyrela_etl_spark.queries import relational

    cust = spark.createDataFrame(
        [(i, "SEG") for i in range(100, 130)], "c_custkey long, c_mktsegment string"
    )
    monkeypatch.setattr(
        relational, "_t", lambda spark, sf_dir, name: cust if name == "customer" else None
    )
    rows = {r["custkey"]: r["min_hops"] for r in relational.sql_recursive_cte(spark, "x").collect()}
    assert len(rows) == 16  # seed + 15 reachable within 5 hops
    assert rows[100] == 0
    for k in range(1, 16):
        assert rows[100 + k] == -(-k // 3)  # ceil(k/3)


def test_native_session_window_inclusive_gap_boundary(spark, monkeypatch):
    """An exactly-30-minute gap MERGES in the native operator (an event
    on the session-end instant extends it — probe-verified), while a
    31-minute gap breaks; window.end = last event + gap. This pins the
    boundary the oracle's >-break mirrors."""
    import datetime

    from cyrela_etl_spark.queries import temporalq

    t0 = datetime.datetime(2026, 8, 2, 9, 0)
    tiny = spark.createDataFrame(
        [
            (1, t0, 7, "t", 1.0),
            (2, t0 + datetime.timedelta(minutes=30), 7, "t", 1.0),  # exactly 30min: merges
            (3, t0 + datetime.timedelta(minutes=75), 7, "t", 1.0),  # 45min gap: breaks
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    monkeypatch.setattr(temporalq, "_events", lambda spark, sf_dir: tiny)
    rows = sorted(
        temporalq.temporal_session_window_native(spark, "x").collect(),
        key=lambda r: r["session_start"],
    )
    assert len(rows) == 2
    assert rows[0]["n_events"] == 2
    assert rows[0]["session_close"] == t0 + datetime.timedelta(minutes=60)
    assert rows[1]["n_events"] == 1
