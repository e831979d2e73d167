"""Model checks for the remaining temporal queries (events_bot_regularity,
temporal_concurrency_curve, temporal_week_over_week, temporal_time_bucket)
— model-check wave 3. Python replays: millisecond-gap CV from exact
integer sums, the sweep-line peak-concurrency maximum with day clipping
and the end-frees-before-start tie rule, WoW deltas with the
absolute-value ppm (the negative-division dialect trap stays untested
territory by design), and the hourly rollup with decimal-exact sums.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_CV_T, _MIN_GAPS = 0.3, 5


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _ev(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_bot_regularity_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_bot_regularity

    got = {
        r["user_id"]: (r["n_gaps"], r["mean_gap_ms"], r["gap_cv"], r["is_regular"])
        for r in events_bot_regularity(spark, sf_dir).collect()
    }
    ev = _ev(sf_dir)
    want = {}
    for uid, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(index=False), key=lambda r: (r.ts, r.event_id))
        ms = [r.ts.value // 10**6 for r in rows]
        gaps = [b - a for a, b in zip(ms, ms[1:])]
        n, sg, sgg = len(gaps), sum(gaps), sum(x * x for x in gaps)
        if n < _MIN_GAPS or sg <= 0:
            continue
        nf, sgf, sggf = float(n), float(sg), float(sgg)
        cv = _round6(math.sqrt(nf * sggf - sgf * sgf) / sgf)
        want[int(uid)] = (n, _round6(sgf / nf), cv, cv < _CV_T)
    assert got == want


def _sessions(ev: pd.DataFrame):
    out = []
    for uid, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(index=False), key=lambda r: (r.ts, r.event_id))
        prev_s, cur = None, None
        for r in rows:
            s = r.ts.value // 10**9
            if prev_s is None or s - prev_s > 1800:
                if cur:
                    out.append(cur)
                cur = [r.ts, r.ts]
            else:
                cur[1] = max(cur[1], r.ts)
            prev_s = s
        if cur:
            out.append(cur)
    return out


def test_concurrency_curve_matches_python_sweep(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import temporal_concurrency_curve

    got = {
        r["day"].isoformat(): r["peak_concurrent"]
        for r in temporal_concurrency_curve(spark, sf_dir).collect()
    }
    ev = _ev(sf_dir)
    deltas: dict = defaultdict(list)
    for start, end in _sessions(ev):
        day = start.normalize()
        while day <= end.normalize():
            seg_start = max(start, day)
            seg_end = min(end, day + pd.Timedelta(days=1))
            deltas[day].append((seg_start, 1))
            deltas[day].append((seg_end, -1))
            day += pd.Timedelta(days=1)
    want = {}
    for day, events in deltas.items():
        cur = peak = 0
        for _, d in sorted(events, key=lambda t: (t[0], t[1])):
            cur += d
            peak = max(peak, cur)
        want[day.isoformat()] = peak
    assert got == want


def test_week_over_week_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import temporal_week_over_week

    got = {
        (r["event_type"], r["week_start"].isoformat()): (
            r["n_events"], r["prev_week"], r["delta"], r["direction"], r["abs_change_ppm"]
        )
        for r in temporal_week_over_week(spark, sf_dir).collect()
    }
    ev = _ev(sf_dir)
    weekly: Counter = Counter()
    for r in ev.itertuples(index=False):
        week = (r.ts - pd.Timedelta(days=r.ts.weekday())).normalize()
        weekly[(r.event_type, week)] += 1
    want = {}
    for et in {k[0] for k in weekly}:
        weeks = sorted(w for t, w in weekly if t == et)
        for prev_w, w in zip(weeks, weeks[1:]):
            n, prev = weekly[(et, w)], weekly[(et, prev_w)]
            delta = n - prev
            want[(et, w.isoformat())] = (
                n, prev, delta, "up" if delta >= 0 else "down",
                (1_000_000 * abs(delta)) // prev,
            )
    assert got == want


def test_time_bucket_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import temporal_time_bucket

    got = {
        (r["bucket"].isoformat(), r["event_type"]): (
            r["n_events"], r["total_value"], r["n_users"]
        )
        for r in temporal_time_bucket(spark, sf_dir).collect()
    }
    ev = _ev(sf_dir)
    agg: dict = defaultdict(lambda: [0, Decimal(0), set()])
    for r in ev.itertuples(index=False):
        key = (r.ts.floor("h").isoformat(), r.event_type)
        a = agg[key]
        a[0] += 1
        a[1] += Decimal(repr(r.value)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        a[2].add(int(r.user_id))
    want = {k: (n, float(s), len(users)) for k, (n, s, users) in agg.items()}
    assert got == want
