"""Model checks for the scale/storage report queries (scale_skew_profile,
scale_join_cardinality, storage_incremental_agg,
storage_equidepth_histogram) — model-check wave 3. Counter models of the
hot-key profile with ppm shares and skew multiples, the per-bucket
containment join estimator against the exact join count, the
incremental-merge serving numbers against a full recompute, and
equal-frequency binning with exact interpolating percentile boundaries.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_PCTS = [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]


def _pct(values: list[float], p: float) -> float:
    s = sorted(values)
    pos = p * (len(s) - 1)
    lo = int(pos)
    frac = pos - lo
    if frac == 0:
        return s[lo]
    return s[lo] + (s[lo + 1] - s[lo]) * frac


def test_skew_profile_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.relational import scale_skew_profile

    got = {
        r["rank"]: (r["key"], r["cnt"], r["share_ppm"], r["skew_x"])
        for r in scale_skew_profile(spark, sf_dir).collect()
    }
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")["o_custkey"]
    counts = Counter(int(k) for k in orders)
    total, n_keys = sum(counts.values()), len(counts)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {
        rank + 1: (key, cnt, (cnt * 1_000_000) // total, (cnt * n_keys) / total)
        for rank, (key, cnt) in enumerate(ranked)
    }
    assert got == want


def test_join_cardinality_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.relational import scale_join_cardinality

    row = scale_join_cardinality(spark, sf_dir).collect()[0]
    got = (row["n_buckets_matched"], row["est_rows"], row["actual_rows"],
           row["est_over_actual_ppm"])
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "event_type"]]
    clicks = Counter(int(r.user_id) for r in ev.itertuples(index=False) if r.event_type == "click")
    purch = Counter(int(r.user_id) for r in ev.itertuples(index=False) if r.event_type == "purchase")

    def hist(c: Counter):
        n: Counter = Counter()
        d: Counter = Counter()
        for uid, cnt in c.items():
            n[uid % 64] += cnt
            d[uid % 64] += 1
        return n, d

    n1, d1 = hist(clicks)
    n2, d2 = hist(purch)
    matched = sorted(set(n1) & set(n2))
    est = sum((n1[b] * n2[b]) // max(d1[b], d2[b]) for b in matched)
    actual = sum(c * purch.get(u, 0) for u, c in clicks.items())
    assert got == (len(matched), est, actual, (est * 1_000_000) // actual)


def test_incremental_agg_matches_full_recompute(spark, sf_dir):
    from cyrela_etl_spark.queries.storageq import storage_incremental_agg

    got = {
        r["o_orderpriority"]: (r["n"], r["total"], r["avg_value"],
                               r["min_value"], r["max_value"])
        for r in storage_incremental_agg(spark, sf_dir).collect()
    }
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderpriority", "o_totalprice"]]
    agg: dict = defaultdict(lambda: [0, Decimal(0), None, None])
    for r in orders.itertuples(index=False):
        a = agg[r.o_orderpriority]
        a[0] += 1
        a[1] += Decimal(repr(r.o_totalprice)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        a[2] = r.o_totalprice if a[2] is None else min(a[2], r.o_totalprice)
        a[3] = r.o_totalprice if a[3] is None else max(a[3], r.o_totalprice)
    want = {
        k: (n, float(s), float(s) / n, lo, hi) for k, (n, s, lo, hi) in agg.items()
    }
    assert got == want


def test_equidepth_histogram_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.storageq import storage_equidepth_histogram

    got = {
        (r["event_type"], r["bin"]): (r["n_rows"], r["min_v"], r["max_v"])
        for r in storage_equidepth_histogram(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "value"]]
    want: dict = {}
    for et, g in ev.groupby("event_type"):
        vals = [v for v in g.value if pd.notna(v)]
        bounds = [_pct(vals, p) for p in _PCTS]
        binned: dict = defaultdict(list)
        for v in vals:
            binned[sum(1 for b in bounds if b < v)].append(v)
        for b, vs in binned.items():
            want[(et, b)] = (len(vs), min(vs), max(vs))
    assert got == want
