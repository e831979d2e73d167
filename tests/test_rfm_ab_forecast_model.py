"""Model checks for events_rfm_segments, events_ab_test,
events_forecast_backtest, and quality_perplexity_buckets — model-check
wave 3. Python replays of the quartile-boundary RFM scoring (interpolated
percentiles, strict comparisons), the pooled two-proportion z with the
30-minute semi-join conversion rule, the seasonal-naive backtest MAE, and
the CCNet-style ntile(3) bucketing on top of the bigram-LM model.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _dec(x: float, places: str) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal(places), rounding=ROUND_HALF_UP)


def _pct(values, p):
    s = sorted(values)
    pos = p * (len(s) - 1)
    lo = int(pos)
    frac = pos - lo
    return s[lo] if frac == 0 else s[lo] + (s[lo + 1] - s[lo]) * frac


def test_rfm_segments_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_rfm_segments

    got = {
        r["user_id"]: (r["recency_days"], r["frequency"], r["monetary"],
                       r["r_score"], r["f_score"], r["m_score"], r["rfm_code"])
        for r in events_rfm_segments(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    anchor = ev.ts.max()
    users = {}
    for uid, g in ev[ev.event_type == "purchase"].groupby("user_id"):
        rec = (anchor.date() - g.ts.max().date()).days
        freq = len(g)
        mon = float(sum(_dec(v, "0.01") for v in g.value))
        users[int(uid)] = (rec, freq, mon)
    rq = [_pct([u[0] for u in users.values()], p) for p in (0.25, 0.5, 0.75)]
    fq = [_pct([u[1] for u in users.values()], p) for p in (0.25, 0.5, 0.75)]
    mq = [_pct([u[2] for u in users.values()], p) for p in (0.25, 0.5, 0.75)]
    want = {}
    for uid, (rec, freq, mon) in users.items():
        r = 1 + (rec < rq[2]) + (rec < rq[1]) + (rec < rq[0])
        f = 1 + (freq > fq[0]) + (freq > fq[1]) + (freq > fq[2])
        m = 1 + (mon > mq[0]) + (mon > mq[1]) + (mon > mq[2])
        want[uid] = (rec, freq, mon, r, f, m, r * 100 + f * 10 + m)
    assert got == want


def test_ab_test_matches_python_model(spark, sf_dir):
    import json

    from cyrela_etl_spark.queries.temporalq import events_ab_test

    row = events_ab_test(spark, sf_dir).collect()[0]
    got = (row["n_a"], row["x_a"], row["n_b"], row["x_b"],
           row["rate_a"], row["rate_b"], row["z_score"])
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    purch = defaultdict(list)
    for r in ev[ev.event_type == "purchase"].itertuples(index=False):
        purch[int(r.user_id)].append(r.ts)
    n = [0, 0]
    x = [0, 0]
    for r in ev[ev.event_type == "click"].itertuples(index=False):
        variant = json.loads(r.props)["k"] % 2
        n[variant] += 1
        conv = any(
            p >= r.ts and p < r.ts + pd.Timedelta(minutes=30)
            for p in purch.get(int(r.user_id), [])
        )
        x[variant] += conv
    p_a, p_b = x[0] / n[0], x[1] / n[1]
    pool = (x[0] + x[1]) / (n[0] + n[1])
    z = (p_a - p_b) / math.sqrt((pool * (1.0 - pool)) * (1.0 / n[0] + 1.0 / n[1]))
    assert got == (n[0], x[0], n[1], x[1], _round6(p_a), _round6(p_b), _round6(z))


def test_forecast_backtest_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_forecast_backtest

    got = {
        r["event_type"]: (r["n_cells"], r["total_actual"], r["total_abs_err"],
                          r["mae_ppm_of_volume"])
        for r in events_forecast_backtest(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "ts"]]
    cells: Counter = Counter()
    for r in ev.itertuples(index=False):
        week = (r.ts - pd.Timedelta(days=r.ts.weekday())).normalize()
        cells[(r.event_type, week, r.ts.weekday() + 1, r.ts.hour)] += 1
    agg: dict = defaultdict(lambda: [0, 0, 0])
    slots: dict = defaultdict(list)
    for (et, week, dow, hour), nv in cells.items():
        slots[(et, dow, hour)].append((week, nv))
    for (et, _, _), series in slots.items():
        series.sort()
        for (_, prev), (_, cur) in zip(series, series[1:]):
            a = agg[et]
            a[0] += 1
            a[1] += cur
            a[2] += abs(cur - prev)
    want = {
        et: (c, tot, err, (1_000_000 * err) // tot) for et, (c, tot, err) in agg.items()
    }
    assert got == want


def test_perplexity_buckets_match_python_model(spark, sf_dir):
    import re

    from cyrela_etl_spark.queries.textq import quality_perplexity_buckets

    got = {
        (r["lang"], r["bucket"]): (r["n_docs"], r["mean_ppm"], r["min_ppm"], r["max_ppm"])
        for r in quality_perplexity_buckets(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "lang", "text"]]
    toks = {
        int(r.doc_id): [t for t in re.split(r"\s+", r.text.lower()) if t]
        for r in docs.itertuples(index=False)
    }
    c2: Counter = Counter()
    c1: Counter = Counter()
    for ts in toks.values():
        c2.update(zip(ts, ts[1:]))
        c1.update(ts[:-1])
    vocab = len({t for ts in toks.values() for t in ts})
    scores = {}
    for doc_id, ts in toks.items():
        ppms = [
            (10**6 * (c2[(a, b)] + 1)) // (c1[a] + vocab) for a, b in zip(ts, ts[1:])
        ]
        if ppms:
            scores[doc_id] = sum(ppms) / len(ppms)
    langs = {int(r.doc_id): r.lang for r in docs.itertuples(index=False)}
    by_lang: dict = defaultdict(list)
    for doc_id, s in scores.items():
        by_lang[langs[doc_id]].append((doc_id, s))
    want = {}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        n = len(rows)
        base, rem = n // 3, n % 3
        idx = 0
        for bucket in (1, 2, 3):
            size = base + (1 if bucket <= rem else 0)
            members = rows[idx : idx + size]
            idx += size
            if not members:
                continue
            vals = [s for _, s in members]
            mean = _round6(
                float(sum(_dec(_round6(v), "0.000001") for v in vals)) / len(vals)
            )
            want[(lang, bucket)] = (len(vals), mean, min(vals), max(vals))
    assert got == want
