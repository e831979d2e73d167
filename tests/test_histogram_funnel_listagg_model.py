"""Model checks for corpus_token_length_histogram,
events_funnel_conversion_time, and agg_listagg — model-check wave 3.
bit_length log2 bins with per-bin token mass, first-occurrence stage
pairs with interpolated delay percentiles, and the sorted LISTAGG order
contract.
"""

from __future__ import annotations

import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_STAGES = ("signup", "click", "purchase")


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _pct(values, p):
    s = sorted(values)
    pos = p * (len(s) - 1)
    lo = int(pos)
    frac = pos - lo
    return s[lo] if frac == 0 else s[lo] + (s[lo + 1] - s[lo]) * frac


def test_token_length_histogram_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import corpus_token_length_histogram

    got = {
        (r["source"], r["len_bin"]): (r["bin_lo_tokens"], r["n_docs"], r["n_tokens"])
        for r in corpus_token_length_histogram(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["source", "text"]]
    agg: dict = defaultdict(lambda: [0, 0])
    for r in docs.itertuples(index=False):
        n = len([t for t in re.split(r"\s+", r.text.lower()) if t])
        if n == 0:
            continue
        b = n.bit_length() - 1
        agg[(r.source, b)][0] += 1
        agg[(r.source, b)][1] += n
    want = {
        (src, b): (2**b, n_docs, n_tok) for (src, b), (n_docs, n_tok) in agg.items()
    }
    assert got == want


def test_funnel_conversion_time_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import events_funnel_conversion_time

    got = {
        (r["from_stage"], r["to_stage"]): (r["n_converted"], r["median_delay_s"],
                                           r["p90_delay_s"])
        for r in events_funnel_conversion_time(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "event_type", "ts"]]
    firsts: dict = {}
    for r in ev.itertuples(index=False):
        if r.event_type not in _STAGES:
            continue
        key = (int(r.user_id), r.event_type)
        s = r.ts.value // 10**9
        if key not in firsts or s < firsts[key]:
            firsts[key] = s
    pairs = [(a, b) for i, a in enumerate(_STAGES) for b in _STAGES[i + 1 :]]
    delays: dict = defaultdict(list)
    users = {uid for uid, _ in firsts}
    for uid in users:
        for a, b in pairs:
            sa, sb = firsts.get((uid, a)), firsts.get((uid, b))
            if sa is not None and sb is not None and sa <= sb:
                delays[(a, b)].append(sb - sa)
    want = {
        k: (len(v), _round6(_pct(v, 0.5)), _round6(_pct(v, 0.9)))
        for k, v in delays.items()
    }
    assert got == want


def test_listagg_matches_sorted_join_model(spark, sf_dir):
    from cyrela_etl_spark.queries.relational import agg_listagg

    got = {
        r["region_key"]: (r["n_nations"], r["names_csv"])
        for r in agg_listagg(spark, sf_dir).collect()
    }
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_regionkey", "n_name"]]
    groups: dict = defaultdict(list)
    for r in nation.itertuples(index=False):
        groups[int(r.n_regionkey)].append(r.n_name)
    want = {k: (len(v), ",".join(sorted(v))) for k, v in groups.items()}
    assert got == want
