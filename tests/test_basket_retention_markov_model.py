"""Model checks for agg_basket_lift, events_retention_cohorts, and
events_markov_transitions — model-check wave 3.

Plain-Python re-derivations over the parquet: basket pairs via explicit
per-order combination walks with the exact-ppm support/lift divisions,
the weekly retention matrix via Monday-truncation arithmetic, and the
Markov matrix via per-user adjacency walks.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations

import pandas as pd

_MIN_PAIRS, _TOP = 3, 20


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_basket_lift_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.relational import agg_basket_lift

    got = [
        (r["part_a"], r["part_b"], r["n_ab"], r["n_a"], r["n_b"],
         r["support_ppm"], r["lift_ppm"])
        for r in agg_basket_lift(spark, sf_dir).collect()
    ]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    baskets: dict[int, set[int]] = defaultdict(set)
    for r in li.itertuples(index=False):
        baskets[int(r.l_orderkey)].add(int(r.l_partkey))
    n_orders = len(baskets)
    item: Counter = Counter()
    pair: Counter = Counter()
    for parts in baskets.values():
        item.update(parts)
        pair.update(combinations(sorted(parts), 2))
    scored = [
        (pa, pb, n_ab, item[pa], item[pb],
         (1_000_000 * n_ab) // n_orders,
         (1_000_000 * n_orders * n_ab) // (item[pa] * item[pb]))
        for (pa, pb), n_ab in pair.items()
        if n_ab >= _MIN_PAIRS
    ]
    scored.sort(key=lambda t: (-t[6], -t[2], t[0], t[1]))
    assert got == scored[:_TOP]


def test_retention_cohorts_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_retention_cohorts

    got = {
        (r["cohort_week"].isoformat(), r["week_offset"]): (
            r["n_active"], r["cohort_size"], r["retention"]
        )
        for r in events_retention_cohorts(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "ts"]]

    def monday(ts: pd.Timestamp) -> pd.Timestamp:
        return (ts - pd.Timedelta(days=ts.weekday())).normalize()

    cohort: dict[int, pd.Timestamp] = {}
    weeks: dict[int, set] = defaultdict(set)
    for r in ev.itertuples(index=False):
        uid = int(r.user_id)
        if uid not in cohort or r.ts < cohort[uid]:
            cohort[uid] = r.ts
        weeks[uid].add(monday(r.ts))
    sizes: Counter = Counter(monday(ts) for ts in cohort.values())
    matrix: Counter = Counter()
    for uid, wset in weeks.items():
        cw = monday(cohort[uid])
        for w in wset:
            matrix[(cw, (w - cw).days // 7)] += 1
    want = {
        (cw.isoformat(), off): (n, sizes[cw], _round6(n / sizes[cw]))
        for (cw, off), n in matrix.items()
    }
    assert got == want


def test_markov_transitions_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_markov_transitions

    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob"])
        for r in events_markov_transitions(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["user_id", "ts", "event_id", "event_type"]
    ]
    trans: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        seq = [
            r.event_type
            for r in sorted(g.itertuples(index=False), key=lambda r: (r.ts, r.event_id))
        ]
        trans.update(zip(seq, seq[1:]))
    totals: Counter = Counter()
    for (f, _), n in trans.items():
        totals[f] += n
    want = {
        (f, t): (n, _round6(n / totals[f])) for (f, t), n in trans.items()
    }
    assert got == want
