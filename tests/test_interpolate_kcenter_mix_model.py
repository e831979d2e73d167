"""Model checks for temporal_interpolate, vector_kcenter_select, and
corpus_domain_mix — model-check wave 3.

- interpolate: the hourly-spine gap fill with decimal-exact observed
  means and the pv + (nv - pv) * frac linear carry over second-truncated
  epoch fractions, replayed as an explicit per-key spine walk.
- k-center: the inherently sequential Gonzalez greedy (fold-dot
  three-term distances, round-6 before the argmax, smallest-id ties)
  re-run as a Python loop.
- domain mix: the exact integer quota arithmetic (caps, the binding
  minimum T, floor quotas) and md5-ranked selection.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_KC_K = 5


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_interpolate_matches_python_spine_walk(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import temporal_interpolate

    got = {
        (r["event_type"], r["bucket"].isoformat()): (r["interpolated"], r["value"])
        for r in temporal_interpolate(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "ts", "value"]]
    sums: dict[tuple, Decimal] = defaultdict(lambda: Decimal(0))
    counts: dict[tuple, int] = defaultdict(int)
    for r in ev.itertuples(index=False):
        b = r.ts.floor("h")
        key = (r.event_type, b)
        sums[key] += Decimal(repr(r.value)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        counts[key] += 1
    vals = {k: float(s) / counts[k] for k, s in sums.items()}
    want = {}
    for et in {k[0] for k in vals}:
        buckets = sorted(b for e, b in vals if e == et)
        spine = pd.date_range(buckets[0], buckets[-1], freq="h")
        observed = {b: vals[(et, b)] for b in buckets}
        for b in spine:
            if b in observed:
                want[(et, b.isoformat())] = (False, _round6(observed[b]))
            else:
                pt = max(x for x in buckets if x < b)
                nt = min(x for x in buckets if x > b)
                frac = (b.value // 10**9 - pt.value // 10**9) / (
                    nt.value // 10**9 - pt.value // 10**9
                )
                pv, nv = observed[pt], observed[nt]
                want[(et, b.isoformat())] = (True, _round6(pv + (nv - pv) * frac))
    assert got == want


def test_kcenter_select_matches_python_greedy(spark, sf_dir):
    from cyrela_etl_spark.queries.vectorq import vector_kcenter_select

    got = [
        (r["sel_rank"], r["vec_id"], r["min_dist_sq"])
        for r in vector_kcenter_select(spark, sf_dir).collect()
    ]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples(index=False)}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def d2(v, c):
        return max(dot(v, v) - 2.0 * dot(v, c) + dot(c, c), 0.0)

    chosen = [min(vecs)]
    want = [(1, chosen[0], None)]
    for rank in range(2, _KC_K + 1):
        best = min(
            (-_round6(min(d2(v, vecs[c]) for c in chosen)), vid)
            for vid, v in vecs.items()
            if vid not in chosen
        )
        chosen.append(best[1])
        want.append((rank, best[1], -best[0]))
    assert got == want


def test_domain_mix_matches_python_quota_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import corpus_domain_mix

    got = {
        r["source"]: (r["n_total"], r["n_kept"], r["share_ppm"])
        for r in corpus_domain_mix(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "source"]]
    by_source: dict[str, list[int]] = defaultdict(list)
    for r in docs.itertuples(index=False):
        by_source[r.source].append(int(r.doc_id))
    weights = {}
    for src in by_source:
        m = re.search(r"([0-9]+)$", src)
        weights[src] = (int(m.group(1)) if m else 0) % 3 + 1
    bigw = sum(weights.values())
    t = min(len(ids) * bigw // weights[src] for src, ids in by_source.items())
    quota = {src: weights[src] * t // bigw for src in by_source}
    kept = {
        src: min(quota[src], len(ids))
        for src, ids in by_source.items()
    }
    total_kept = sum(kept.values())
    want = {
        src: (len(ids), kept[src], 1_000_000 * kept[src] // total_kept)
        for src, ids in by_source.items()
    }
    assert got == want
