"""Model check for the deterministic k-means family
(operators/clustering.py via vector_kmeans_clusters /
vector_cluster_quality) — model-check wave 3.

Replays both Lloyd rounds in plain Python exactly as the operator pins
them: md5-ordered seeding, sequential-fold dots, the
round6(max(vv - 2vc + cc, 0)) distance with (dist2, cid) argmin ties,
exact-Decimal centroid means and inertia, and the k x k nearest-other-
centroid separation with struct-min ties. Every float op is performed in
the engine's operation order, so the comparison is bit-for-bit.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_K, _ITERS, _DIM = 8, 2, 64


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _dist2(v: list[float], c: list[float]) -> float:
    return _round6(max(_dot(v, v) - 2.0 * _dot(v, c) + _dot(c, c), 0.0))


def _assign(vecs: dict[int, list[float]], cents: dict[int, list[float]]):
    out = {}
    for vid, v in vecs.items():
        out[vid] = min(((_dist2(v, cv), cid) for cid, cv in cents.items()))
    return out  # vid -> (dist2, cid)


def _means(vecs, assigned) -> dict[int, list[float]]:
    sums: dict[int, list[Decimal]] = {}
    counts: dict[int, int] = {}
    for vid, (_, cid) in assigned.items():
        v = vecs[vid]
        if cid not in sums:
            sums[cid] = [Decimal(0)] * _DIM
            counts[cid] = 0
        counts[cid] += 1
        for d in range(_DIM):
            sums[cid][d] += Decimal(repr(v[d])).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
    return {
        cid: [float(s[d]) / counts[cid] for d in range(_DIM)]
        for cid, s in sums.items()
    }


def _lloyd(sf_dir: str):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples(index=False)
    }
    seed_ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:_K]
    cents = {i: vecs[i] for i in seed_ids}
    assigned = _assign(vecs, cents)
    for _ in range(_ITERS - 1):
        cents = _means(vecs, assigned)
        assigned = _assign(vecs, cents)
    return vecs, cents, assigned


def _inertia(dist2s: list[float]) -> float:
    return float(
        sum(
            Decimal(repr(d)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
            for d in dist2s
        )
    )


def test_kmeans_cluster_profile_matches_python_lloyd(spark, sf_dir):
    from cyrela_etl_spark.queries.vectorq import vector_kmeans_clusters

    got = {
        r["cid"]: (r["n_points"], r["inertia"], r["mean_dist2"])
        for r in vector_kmeans_clusters(spark, sf_dir).collect()
    }
    _, _, assigned = _lloyd(sf_dir)
    by_cid: dict[int, list[float]] = {}
    for _, (d2, cid) in assigned.items():
        by_cid.setdefault(cid, []).append(d2)
    want = {}
    for cid, d2s in by_cid.items():
        inertia = _inertia(d2s)
        want[cid] = (len(d2s), inertia, _round6(inertia / len(d2s)))
    assert got == want


def test_kmeans_quality_profile_matches_python_lloyd(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import vector_cluster_quality

    got = {
        r["cid"]: (r["n_points"], r["mean_dist2"], r["nn_cid"], r["nn_dist2"], r["db_ratio"])
        for r in vector_cluster_quality(spark, sf_dir).collect()
    }
    _, cents, assigned = _lloyd(sf_dir)
    by_cid: dict[int, list[float]] = {}
    for _, (d2, cid) in assigned.items():
        by_cid.setdefault(cid, []).append(d2)
    want = {}
    for cid, d2s in by_cid.items():
        nn_d2, nn_cid = min(
            (_dist2(cents[cid], cv), ocid) for ocid, cv in cents.items() if ocid != cid
        )
        mean_d2 = _round6(_inertia(d2s) / len(d2s))
        want[cid] = (len(d2s), mean_d2, nn_cid, nn_d2, _round6(mean_d2 / nn_d2))
    assert got == want
