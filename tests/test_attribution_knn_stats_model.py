"""Model checks for events_attribution, events_anomaly_mad,
events_conversion_wilson, vector_knn_classify, and graph_assortativity —
model-check wave 3.

Each is a plain-Python re-derivation with the engine's pinned arithmetic:
the 7-day last-touch walk (with the click-before-purchase tie order),
exact interpolating percentiles for the modified z-score, the Wilson
interval's fixed IEEE chain, majority-vote kNN with smallest-label ties
over the fold-cosine top-k, and Newman assortativity from exact integer
sufficient statistics over the shingle-graph edges.
"""

from __future__ import annotations

import json
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_Z2 = 3.8415
_K, _N_QUERIES = 5, 8
_DF_MIN, _DF_MAX = 2, 5


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _pct(values: list[float], p: float) -> float:
    """Spark percentile(): sort, pos = p*(n-1), linear interpolation."""
    s = sorted(values)
    pos = p * (len(s) - 1)
    lo = int(pos)
    frac = pos - lo
    if frac == 0:
        return s[lo]
    return s[lo] + (s[lo + 1] - s[lo]) * frac


def test_events_attribution_matches_python_walk(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_attribution

    got = {
        r["channel"]: (r["n_purchases"], r["revenue"])
        for r in events_attribution(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    by_channel: dict[int, list[float]] = defaultdict(list)
    for _, g in ev.groupby("user_id"):
        rows = []
        for r in g.itertuples(index=False):
            if r.event_type == "click":
                rows.append((r.ts, 0, r.event_id, json.loads(r.props)["k"] % 10, None))
            elif r.event_type == "purchase":
                rows.append((r.ts, 1, r.event_id, None, r.value))
        rows.sort(key=lambda t: t[:3])
        last_ts, last_ch = None, None
        for ts, tag, _, ch, value in rows:
            if tag == 0:
                last_ts, last_ch = ts, ch
            else:
                ok = last_ts is not None and last_ts + pd.Timedelta(days=7) > ts
                by_channel[last_ch if ok else -1].append(value)
        # engine credits channel per purchase row; walk order matches the
        # (ts, tag, event_id) window sort
    want = {
        ch: (
            len(vals),
            float(
                sum(
                    Decimal(repr(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
                    for v in vals
                )
            ),
        )
        for ch, vals in by_channel.items()
    }
    assert got == want


def test_events_anomaly_mad_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_anomaly_mad

    got = {
        r["event_id"]: (r["event_type"], r["value"], r["key_median"],
                        r["key_mad"], r["robust_z"])
        for r in events_anomaly_mad(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_id", "event_type", "value"]]
    want = {}
    for et, g in ev.groupby("event_type"):
        vals = list(g.value)
        med = _pct(vals, 0.5)
        mad = _pct([abs(v - med) for v in vals], 0.5)
        if mad <= 0:
            continue
        for r in g.itertuples(index=False):
            mz = _round6(0.6745 * ((r.value - med) / mad))
            if abs(mz) > 3.5:
                want[int(r.event_id)] = (et, r.value, _round6(med), _round6(mad), mz)
    assert got == want


def test_conversion_wilson_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import events_conversion_wilson

    got = {
        r["cohort"]: (r["n"], r["x"], r["rate"], r["wilson_lo"], r["wilson_hi"])
        for r in events_conversion_wilson(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "event_type"]]
    per_user: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for r in ev.itertuples(index=False):
        if r.event_type == "click":
            per_user[int(r.user_id)][0] = 1
        elif r.event_type == "purchase":
            per_user[int(r.user_id)][1] = 1
    cohorts: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for uid, (clicked, purchased) in per_user.items():
        if clicked:
            cohorts[uid % 10][0] += 1
            cohorts[uid % 10][1] += purchased
    want = {}
    for cohort, (n_i, x_i) in cohorts.items():
        n, x = float(n_i), float(x_i)
        p = x / n
        center = (p + _Z2 / (2 * n)) / (1 + _Z2 / n)
        half = (math.sqrt((p * (1 - p)) / n + _Z2 / (4 * n * n)) * math.sqrt(_Z2)) / (
            1 + _Z2 / n
        )
        want[cohort] = (n_i, x_i, _round6(p), _round6(center - half), _round6(center + half))
    assert got == want


def test_knn_classify_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.vectorq import vector_knn_classify

    got = {
        r["query_id"]: (r["predicted_label"], r["votes"], r["true_label"], r["correct"])
        for r in vector_knn_classify(spark, sf_dir).collect()
    }
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples(index=False)}
    labels = {int(r.vec_id): int(r.label) for r in emb.itertuples(index=False)}

    def fold_cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot = dot + x * y
        for x in a:
            na = na + x * x
        for y in b:
            nb = nb + y * y
        return _round6(dot / (math.sqrt(na) * math.sqrt(nb)))

    want = {}
    for qid in range(_N_QUERIES):
        scored = sorted(
            ((-fold_cos(vecs[qid], v), vid) for vid, v in vecs.items() if vid != qid)
        )[:_K]
        votes = Counter(labels[vid] for _, vid in scored)
        n_votes, neg_label = max((c, -lab) for lab, c in votes.items())
        pred = -neg_label
        want[qid] = (pred, n_votes, labels[qid], pred == labels[qid])
    assert got == want


def test_graph_assortativity_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import graph_assortativity

    row = graph_assortativity(spark, sf_dir).collect()[0]
    got = (row["n_nodes"], row["n_edges"], row["assortativity"])

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    posting: dict[str, list[int]] = defaultdict(list)
    for r in docs.itertuples(index=False):
        toks = [t for t in re.split(r"\s+", r.text.lower()) if t]
        if not toks:
            continue
        n_grams = max(len(toks) - 2, 1)
        grams = {" ".join(toks[i : i + 3]) for i in range(n_grams)}
        for g in grams:
            posting[g].append(int(r.doc_id))
    edges: set[tuple[int, int]] = set()
    for ids in posting.values():
        if _DF_MIN <= len(ids) <= _DF_MAX:
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    edges.add((a, b))
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    directed = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    m = len(directed)
    sx = float(sum(deg[a] for a, _ in directed))
    sy = float(sum(deg[b] for _, b in directed))
    sxx = float(sum(deg[a] * deg[a] for a, _ in directed))
    syy = float(sum(deg[b] * deg[b] for _, b in directed))
    sxy = float(sum(deg[a] * deg[b] for a, b in directed))
    md = float(m)
    num = md * sxy - sx * sy
    varx = md * sxx - sx * sx
    vary = md * syy - sy * sy
    r_val = (
        _round6(num / (math.sqrt(varx) * math.sqrt(vary)))
        if varx > 0 and vary > 0
        else None
    )
    n_nodes = len({v for ab in edges for v in ab})
    assert got == (n_nodes, len(edges), r_val)
