"""Model checks for the embedding-diagnostics queries (ml_class_weights,
vector_norm_profile, vector_label_margin, vector_jl_projection,
vector_centroid_shift) — model-check wave 3. Fold-exact Python replays:
inverse-frequency weights, per-label norm profiles over rounded fold
norms, the 16-per-label sampled intra/inter cosine margins (inter pairs
credited to BOTH labels), JL-projected L2 recall against exact L2 (with
the engine's seed-pinned planes as shared constants, exactly as the
oracle embeds them), and the one-round Lloyd centroid shift.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_K, _N_QUERIES, _LM_SAMPLE, _CQ_K, _DIM = 5, 8, 16, 8, 64


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _dec6(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _l2(a):
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def _vecs(sf_dir: str):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return (
        {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples(index=False)},
        {int(r.vec_id): int(r.label) for r in emb.itertuples(index=False)},
    )


def test_class_weights_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import ml_class_weights

    got = {
        r["label"]: (r["n"], r["weight"]) for r in ml_class_weights(spark, sf_dir).collect()
    }
    _, labels = _vecs(sf_dir)
    counts: dict[int, int] = defaultdict(int)
    for lab in labels.values():
        counts[lab] += 1
    n_total, k = sum(counts.values()), len(counts)
    want = {lab: (n, _round6(n_total / (k * n))) for lab, n in counts.items()}
    assert got == want


def test_norm_profile_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.vectorq import vector_norm_profile

    got = {
        r["label"]: (r["n_vectors"], r["min_norm"], r["max_norm"],
                     r["mean_norm"], r["n_near_zero"])
        for r in vector_norm_profile(spark, sf_dir).collect()
    }
    vecs, labels = _vecs(sf_dir)
    per: dict[int, list[float]] = defaultdict(list)
    for vid, v in vecs.items():
        per[labels[vid]].append(_round6(_l2(v)))
    want = {
        lab: (
            len(ns), min(ns), max(ns),
            _round6(float(sum(_dec6(n) for n in ns)) / len(ns)),
            sum(1 for n in ns if n < 0.001),
        )
        for lab, ns in per.items()
    }
    assert got == want


def test_label_margin_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.vectorq import vector_label_margin

    got = {
        r["label"]: (r["n_intra"], r["mean_intra"], r["n_inter"], r["mean_inter"], r["margin"])
        for r in vector_label_margin(spark, sf_dir).collect()
    }
    vecs, labels = _vecs(sf_dir)
    by_label: dict[int, list[int]] = defaultdict(list)
    for vid in sorted(vecs):
        if len(by_label[labels[vid]]) < _LM_SAMPLE:
            by_label[labels[vid]].append(vid)
    sampled = sorted(v for ids in by_label.values() for v in ids)
    intra: dict[int, list[Decimal]] = defaultdict(list)
    inter: dict[int, list[Decimal]] = defaultdict(list)
    for i, a in enumerate(sampled):
        for b in sampled[i + 1 :]:
            cos = _dec6(_round6(_dot(vecs[a], vecs[b]) / (_l2(vecs[a]) * _l2(vecs[b]))))
            if labels[a] == labels[b]:
                intra[labels[a]].append(cos)
            else:
                inter[labels[a]].append(cos)
                inter[labels[b]].append(cos)
    want = {}
    for lab in by_label:
        mi = _round6(float(sum(intra[lab])) / len(intra[lab]))
        me = _round6(float(sum(inter[lab])) / len(inter[lab]))
        want[lab] = (len(intra[lab]), mi, len(inter[lab]), me, _round6(mi - me))
    assert got == want


def _l2_topk_ids(vecs, qids, k):
    out = {}
    for qid in qids:
        q = vecs[qid]
        scored = sorted(
            (
                (_round6(math.sqrt(max(_dot(q, q) - 2.0 * _dot(q, v) + _dot(v, v), 0.0))), vid)
                for vid, v in vecs.items()
                if vid != qid
            )
        )
        out[qid] = {vid for _, vid in scored[:k]}
    return out


def test_jl_projection_recall_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.operators.similarity import _hyperplanes
    from cyrela_etl_spark.queries.round8q import vector_jl_projection

    got = {
        r["query_id"]: (r["n_hits"], r["recall_at_k"])
        for r in vector_jl_projection(spark, sf_dir).collect()
    }
    vecs, _ = _vecs(sf_dir)
    qids = [v for v in vecs if v < _N_QUERIES]
    planes = _hyperplanes(64, 16, seed=7)
    proj = {
        vid: [_round6(_dot(v, p)) for p in planes] for vid, v in vecs.items()
    }
    exact = _l2_topk_ids(vecs, qids, _K)
    approx = _l2_topk_ids(proj, qids, _K)
    want = {
        qid: (len(exact[qid] & approx[qid]), _round6(len(exact[qid] & approx[qid]) / float(_K)))
        for qid in qids
    }
    assert got == want


def test_centroid_shift_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import vector_centroid_shift

    got = {
        r["cid"]: r["shift_dist2"] for r in vector_centroid_shift(spark, sf_dir).collect()
    }
    vecs, _ = _vecs(sf_dir)
    seed_ids = sorted(
        vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:_CQ_K]
    cents = {i: vecs[i] for i in seed_ids}

    def d2(v, c):
        return _round6(max(_dot(v, v) - 2.0 * _dot(v, c) + _dot(c, c), 0.0))

    assigned: dict[int, list[list[float]]] = defaultdict(list)
    for vid, v in vecs.items():
        _, cid = min((d2(v, cv), cid) for cid, cv in cents.items())
        assigned[cid].append(v)
    want = {}
    for cid, members in assigned.items():
        mean = [
            float(sum(_dec6(v[d]) for v in members)) / len(members) for d in range(_DIM)
        ]
        want[cid] = d2(cents[cid], mean)
    assert got == want
