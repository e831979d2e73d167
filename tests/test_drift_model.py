"""Model checks for the two drift monitors (events_heatmap_drift,
storage_histogram_drift) — model-check wave 3. Both are exact-integer
total-variation-style reports; the Python models rebuild the profiles
from the parquet with plain Counters: millisecond-epoch half-splitting
and isodow/hour cells for the behavioral heatmap, integer-cent equi-width
bins with the shared-edge formula for the value histogram.
"""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_BINS = 20


def test_heatmap_drift_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_heatmap_drift

    got = {
        r["event_type"]: (r["l1_drift_ppm"], r["n_cells"])
        for r in events_heatmap_drift(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "ts"]]
    ms = [t.value // 10**6 for t in ev.ts]
    t0, t1 = min(ms), max(ms)
    cells: Counter = Counter()
    totals: Counter = Counter()
    for (et, ts), m in zip(ev.itertuples(index=False), ms):
        half = "a" if 2 * m < t0 + t1 else "b"
        cells[(et, half, ts.weekday() + 1, ts.hour)] += 1
        totals[(et, half)] += 1
    ppm = {
        key: (1_000_000 * n) // totals[key[:2]] for key, n in cells.items()
    }
    want: dict[str, list[int]] = {}
    keys = {(et, dow, h) for et, _, dow, h in cells}
    agg: Counter = Counter()
    ncell: Counter = Counter()
    for et, dow, h in keys:
        pa = ppm.get((et, "a", dow, h), 0)
        pb = ppm.get((et, "b", dow, h), 0)
        agg[et] += abs(pa - pb)
        ncell[et] += 1
    assert got == {et: (agg[et], ncell[et]) for et in agg}


def test_histogram_drift_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.storageq import storage_histogram_drift

    got = {
        r["bin"]: (r["n_base"], r["n_curr"], r["share_base_ppm"],
                   r["share_curr_ppm"], r["l1_ppm"])
        for r in storage_histogram_drift(spark, sf_dir).collect()
    }
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_totalprice"]]
    cents = [
        (int(r.o_orderkey),
         int(Decimal(repr(r.o_totalprice * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)))
        for r in orders.itertuples(index=False)
    ]
    min_c = min(c for _, c in cents)
    max_c = max(c for _, c in cents)
    base: Counter = Counter()
    curr: Counter = Counter()
    for key, c in cents:
        b = min(((c - min_c) * _BINS) // (max_c - min_c + 1), _BINS - 1)
        (base if key % 2 == 0 else curr)[b] += 1
    bt, ct = sum(base.values()), sum(curr.values())
    want = {}
    for b in set(base) | set(curr):
        sb = (base.get(b, 0) * 1_000_000) // bt if b in base else 0
        sc = (curr.get(b, 0) * 1_000_000) // ct if b in curr else 0
        want[b] = (base.get(b, 0), curr.get(b, 0), sb, sc, abs(sb - sc))
    assert got == want
