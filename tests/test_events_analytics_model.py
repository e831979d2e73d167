"""Model checks for the events-analytics KPI queries (events_stickiness,
events_seasonality, events_new_vs_returning, events_power_pareto) —
model-check wave 3. Counter/set models over the events parquet pinning
the DAU/MAU distinct arithmetic, the isodow/hour ppm shares, the
first-day acquisition split, and the count-granularity Lorenz curve with
its descending cumulative sums.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _ev(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_stickiness_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_stickiness

    got = {
        r["day"].isoformat(): (r["dau"], r["mau"], r["stickiness"])
        for r in events_stickiness(spark, sf_dir).collect()
    }
    ev = _ev(sf_dir)
    day_users: dict = defaultdict(set)
    month_users: dict = defaultdict(set)
    for r in ev.itertuples(index=False):
        day = r.ts.normalize()
        month = day.replace(day=1)
        day_users[(month, day)].add(int(r.user_id))
        month_users[month].add(int(r.user_id))
    want = {}
    for (month, day), users in day_users.items():
        dau, mau = len(users), len(month_users[month])
        want[day.isoformat()] = (dau, mau, _round6(dau / mau))
    assert got == want


def test_seasonality_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_seasonality

    got = {
        (r["event_type"], r["iso_dow"], r["hour_of_day"]): (r["n_events"], r["share_ppm"])
        for r in events_seasonality(spark, sf_dir).collect()
    }
    ev = _ev(sf_dir)
    cells: Counter = Counter()
    totals: Counter = Counter()
    for r in ev.itertuples(index=False):
        cells[(r.event_type, r.ts.weekday() + 1, r.ts.hour)] += 1
        totals[r.event_type] += 1
    want = {
        key: (n, (1_000_000 * n) // totals[key[0]]) for key, n in cells.items()
    }
    assert got == want


def test_new_vs_returning_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_new_vs_returning

    got = {
        r["day"].isoformat(): (r["n_new"], r["n_returning"], r["n_active"])
        for r in events_new_vs_returning(spark, sf_dir).collect()
    }
    ev = _ev(sf_dir)
    user_days: dict = defaultdict(set)
    for r in ev.itertuples(index=False):
        user_days[int(r.user_id)].add(r.ts.normalize())
    per_day: dict = defaultdict(lambda: [0, 0])
    for uid, days in user_days.items():
        first = min(days)
        for d in days:
            per_day[d][0 if d == first else 1] += 1
    want = {
        d.isoformat(): (new, ret, new + ret) for d, (new, ret) in per_day.items()
    }
    assert got == want


def test_power_pareto_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import events_power_pareto

    got = {
        r["events_per_user"]: (r["n_users"], r["cum_users"], r["cum_events"],
                               r["user_share"], r["event_share"])
        for r in events_power_pareto(spark, sf_dir).collect()
    }
    ev = _ev(sf_dir)
    per_user = Counter(int(u) for u in ev.user_id)
    hist = Counter(per_user.values())
    tu = sum(hist.values())
    te = sum(c * n for c, n in hist.items())
    want = {}
    cum_u = cum_e = 0
    for c in sorted(hist, reverse=True):
        n = hist[c]
        cum_u += n
        cum_e += c * n
        want[c] = (n, cum_u, cum_e, cum_u / tu, cum_e / te)
    assert got == want
