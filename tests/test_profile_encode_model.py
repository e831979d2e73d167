"""Model checks for events_anomaly_zscore, storage_moments_profile,
ml_target_encode, agg_regression_slope, and storage_correlation_profile —
model-check waves 3 and 6. Decimal power sums cast to double once, then
the engines' fixed IEEE chains replayed with the same Python expression
trees: the sample-variance z-score with degenerate-key drops, the
raw-moment skew/kurtosis identities (m2*sqrt(m2) denominators), the
empirical-Bayes target encode in its exact rational form, the OLS
slope/intercept/r² closed forms, and the three Pearson pairs.

The two wave-6 additions (round 17) close the last score-1 rows of the
shared-construction sweep that were dispositioned by hand: both queries'
oracles deliberately spell the engine's IEEE chain over the same exact
sufficient statistics (the determinism contract), so a wrong CLOSED FORM
would pass engine+oracle by construction — these models recompute the
statistics and the algebra from raw parquet rows in plain Python.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_Z = 2.0
_M = 20.0


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _dec2(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


def test_anomaly_zscore_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_anomaly_zscore

    got = {
        r["event_id"]: (r["event_type"], r["value"], r["key_mean"], r["zscore"])
        for r in events_anomaly_zscore(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_id", "event_type", "value"]]
    want = {}
    for et, g in ev.groupby("event_type"):
        decs = [_dec2(v) for v in g.value]
        n = float(len(decs))
        s = float(sum(decs))
        q = float(sum(d * d for d in decs))
        if len(decs) < 2:
            continue
        mean = s / n
        var = (n * q - s * s) / (n * (n - 1))
        std = math.sqrt(var)
        if not std > 0:
            continue
        for r in g.itertuples(index=False):
            z = _round6((r.value - mean) / std)
            if abs(z) > _Z:
                want[int(r.event_id)] = (et, r.value, _round6(mean), z)
    assert got == want


def test_moments_profile_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.storageq import storage_moments_profile

    got = {
        r["l_returnflag"]: (r["n_rows"], r["mean_value"], r["pop_variance"],
                            r["skewness"], r["ex_kurtosis"])
        for r in storage_moments_profile(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_returnflag", "l_quantity"]]
    want = {}
    for flag, g in li.groupby("l_returnflag"):
        decs = [_dec2(v) for v in g.l_quantity]
        n = float(len(decs))
        s1 = float(sum(decs))
        s2 = float(sum(d * d for d in decs))
        s3 = float(sum((d * d) * d for d in decs))
        s4 = float(sum((d * d) * (d * d) for d in decs))
        m = s1 / n
        r2, r3, r4 = s2 / n, s3 / n, s4 / n
        m2 = r2 - m * m
        m3 = r3 - 3 * m * r2 + 2 * m * m * m
        m4 = r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m
        if len(decs) < 2 or not m2 > 0:
            continue
        want[flag] = (
            len(decs), _round6(m), _round6(m2),
            _round6(m3 / (m2 * math.sqrt(m2))), _round6(m4 / (m2 * m2) - 3),
        )
    assert got == want


def test_target_encode_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.mlprepq import ml_target_encode

    got = {
        r["c_mktsegment"]: (r["n_orders"], r["raw_mean"], r["encoded_mean"])
        for r in ml_target_encode(spark, sf_dir).collect()
    }
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_custkey", "o_totalprice"]]
    seg_of = {int(r.c_custkey): r.c_mktsegment for r in cust.itertuples(index=False)}
    per_seg: dict = defaultdict(lambda: [0, Decimal(0)])
    for r in orders.itertuples(index=False):
        seg = seg_of.get(int(r.o_custkey))
        if seg is None:
            continue
        per_seg[seg][0] += 1
        per_seg[seg][1] += _dec2(r.o_totalprice)
    n_total = sum(n for n, _ in per_seg.values())
    sum_total = sum(s for _, s in per_seg.values())
    n, s = float(n_total), float(sum_total)
    want = {}
    for seg, (n_g_i, sg_d) in per_seg.items():
        sg, n_g = float(sg_d), float(n_g_i)
        want[seg] = (
            n_g_i,
            _round6(sg / n_g),
            _round6((sg * n + _M * s) / (n * (n_g + _M))),
        )
    assert got == want


def test_regression_slope_matches_python_model(spark, sf_dir):
    """agg_regression_slope: per-returnflag OLS of l_extendedprice on
    l_quantity. The Decimal(7,2)/(12,2) inputs make every sufficient
    statistic (n, Σx, Σy, Σx², Σxy, Σy²) exact; the model recomputes
    them and the slope/intercept/r² closed forms independently, incl.
    the zero-variance drop rule."""
    from cyrela_etl_spark.queries.relational import agg_regression_slope

    got = {
        r["l_returnflag"]: (r["n_rows"], r["slope"], r["intercept"], r["r2"])
        for r in agg_regression_slope(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_returnflag", "l_quantity", "l_extendedprice"]
    ]
    want = {}
    for flag, g in li.groupby("l_returnflag"):
        xs = [_dec2(v) for v in g.l_quantity]
        ys = [_dec2(v) for v in g.l_extendedprice]
        n = len(xs)
        sx = float(sum(xs))
        sy = float(sum(ys))
        sxx = float(sum(x * x for x in xs))
        sxy = float(sum(x * y for x, y in zip(xs, ys)))
        syy = float(sum(y * y for y in ys))
        nd = float(n)
        num = nd * sxy - sx * sy
        varx = nd * sxx - sx * sx
        vary = nd * syy - sy * sy
        if not (varx > 0 and vary > 0):
            continue
        slope = num / varx
        want[flag] = (
            n,
            _round6(slope),
            _round6((sy - slope * sx) / nd),
            _round6(num * num / (varx * vary)),
        )
    assert got == want


def test_correlation_profile_matches_python_model(spark, sf_dir):
    """storage_correlation_profile: the three Pearson pairs over
    (l_quantity, l_extendedprice, l_discount) from one scan of exact
    Decimal co-moment sums; the model recomputes every sum and the
    corr chain (each factor under its own sqrt, as the engine and
    oracle both spell it) from raw rows."""
    from cyrela_etl_spark.queries.storageq import storage_correlation_profile

    got = {
        (r["col_x"], r["col_y"]): (r["n_rows"], r["pearson_corr"])
        for r in storage_correlation_profile(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_quantity", "l_extendedprice", "l_discount"]
    ]
    q = [_dec2(v) for v in li.l_quantity]
    p = [_dec2(v) for v in li.l_extendedprice]
    d4 = Decimal("0.0001")
    d = [Decimal(repr(v)).quantize(d4, rounding=ROUND_HALF_UP) for v in li.l_discount]
    n = float(len(q))

    def _corr(xs, ys):
        sx = float(sum(xs))
        sy = float(sum(ys))
        sxx = float(sum(x * x for x in xs))
        syy = float(sum(y * y for y in ys))
        sxy = float(sum(x * y for x, y in zip(xs, ys)))
        return _round6(
            (n * sxy - sx * sy)
            / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
        )

    want = {
        ("l_quantity", "l_extendedprice"): (int(n), _corr(q, p)),
        ("l_quantity", "l_discount"): (int(n), _corr(q, d)),
        ("l_extendedprice", "l_discount"): (int(n), _corr(p, d)),
    }
    assert got == want
