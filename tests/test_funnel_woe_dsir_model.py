"""Model checks for three analytics queries with subtle sequential or
rational arithmetic (events_funnel, ml_woe_iv, corpus_dsir_weights) —
model-check wave 3.

- events_funnel: per-user ordered stage walk (first view, first click at
  or after it, first purchase at or after that) as explicit Python
  min-over-filtered-lists, including the null-propagation contract (a
  user with no view can convert nothing downstream). The engine's array
  formulation and the oracle's join-per-stage SQL are two derivations;
  this is the third.
- ml_woe_iv: weight-of-evidence/IV with the zero-cell exclusion, the
  double-division ln argument, and the Decimal(38,12) IV fold.
- corpus_dsir_weights: hashed-bigram importance ratios in exact ppm
  integers (add-1 smoothing, truncating divisions) via hashlib.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd


def _round(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def test_events_funnel_matches_python_stage_walk(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_funnel

    row = events_funnel(spark, sf_dir).collect()[0]
    got = (row["n_users"], row["n_view"], row["n_view_click"], row["n_full_funnel"])

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "event_type", "ts"]]
    n_users = n_view = n_click = n_full = 0
    for _, g in ev.groupby("user_id"):
        n_users += 1
        by_type = defaultdict(list)
        for r in g.itertuples(index=False):
            by_type[r.event_type].append(r.ts)
        first_view = min(by_type["view"], default=None)
        first_click = (
            min((t for t in by_type["click"] if t >= first_view), default=None)
            if first_view is not None
            else None
        )
        first_purchase = (
            min((t for t in by_type["purchase"] if t >= first_click), default=None)
            if first_click is not None
            else None
        )
        n_view += first_view is not None
        n_click += first_click is not None
        n_full += first_purchase is not None
    assert got == (n_users, n_view, n_click, n_full)


def test_ml_woe_iv_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import ml_woe_iv

    got = {
        (r["feature"], r["category"]): (r["n_pos"], r["n_neg"], r["woe"], r["iv"])
        for r in ml_woe_iv(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_returnflag"]]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_orderpriority", "o_orderdate"]
    ]
    is_ret = (
        li.assign(r=(li.l_returnflag == "R").astype(int))
        .groupby("l_orderkey")["r"]
        .max()
    )
    feats: list[tuple[int, str, str]] = []
    for r in orders.itertuples(index=False):
        if r.o_orderkey not in is_ret.index:
            continue
        ret = int(is_ret[r.o_orderkey])
        feats.append((ret, "priority", r.o_orderpriority))
        feats.append((ret, "order_month", str(pd.Timestamp(r.o_orderdate).month)))
    pos_tot = sum(r for r, _, _ in feats)
    neg_tot = len(feats) - pos_tot
    cells: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0])
    for ret, f, c in feats:
        cells[(f, c)][0] += ret
        cells[(f, c)][1] += 1 - ret
    contribs: dict[str, Decimal] = defaultdict(lambda: Decimal(0))
    scored = {}
    for (f, c), (n_pos, n_neg) in cells.items():
        if n_pos == 0 or n_neg == 0:
            continue
        woe = _round(math.log((n_pos * neg_tot) / (n_neg * pos_tot)), 6)
        contrib = Decimal(repr((n_pos / pos_tot - n_neg / neg_tot) * woe)).quantize(
            Decimal(1).scaleb(-12), rounding=ROUND_HALF_UP
        )
        contribs[f] += contrib
        scored[(f, c)] = (n_pos, n_neg, woe)
    want = {
        key: (*vals, _round(float(contribs[key[0]]), 6)) for key, vals in scored.items()
    }
    assert got == want


def test_dsir_weights_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import corpus_dsir_weights

    got = {
        r["doc_id"]: (r["n_grams"], r["score_ppm"])
        for r in corpus_dsir_weights(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    per_doc: dict[int, list[int]] = {}
    stats: Counter = Counter()
    tgt: Counter = Counter()
    rows = []
    for r in docs.itertuples(index=False):
        toks = [t for t in re.split(r"\s+", r.text.lower()) if t]
        if len(toks) < 2:
            continue
        is_tgt = 1 if len(r.text) >= 800 else 0
        buckets = [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:15], 16) % 512
            for a, b in zip(toks, toks[1:])
        ]
        rows.append((int(r.doc_id), is_tgt, buckets))
        for bk in buckets:
            stats[bk] += 1
            tgt[bk] += is_tgt
    R, T = sum(stats.values()), sum(tgt.values())
    ratio = {
        bk: ((tgt[bk] + 1) * (R + 512) * 1_000_000) // ((cr + 1) * (T + 512))
        for bk, cr in stats.items()
    }
    want = {
        doc_id: (len(buckets), sum(ratio[bk] for bk in buckets) // len(buckets))
        for doc_id, _, buckets in rows
    }
    assert got == want
