"""Model checks for ml_feature_hash and vector_semdedup_pairs —
model-check wave 3. hashlib rebuild of the signed hashing-trick buckets
(Weinberger et al.'s +/-1 second hash as bit 6 of the same md5 value),
and a fold-cosine SemDeDup replay: planted x2-scaled near-dups, md5
seeding, ROUNDED-cosine argmax assignment (cid-asc ties), in-cluster
pairs at the 0.99 threshold.
"""

from __future__ import annotations

import hashlib
import json
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_BUCKETS = 64
_SEM_C, _SEM_T = 16, 0.99


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_feature_hash_matches_hashlib_model(spark, sf_dir):
    from cyrela_etl_spark.queries.mlprepq import ml_feature_hash

    got = {
        r["bucket"]: (r["signed_count"], r["n_features"], r["n_distinct_features"])
        for r in ml_feature_hash(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "props", "user_id"]]
    signed: Counter = Counter()
    n_feat: Counter = Counter()
    distinct: dict[int, set] = defaultdict(set)
    for r in ev.itertuples(index=False):
        feats = [
            f"et={r.event_type}",
            f"k={json.loads(r.props)['k']}",
            f"ub={int(r.user_id) % 100}",
        ]
        for feat in feats:
            h = _h60(feat)
            b = h % _BUCKETS
            signed[b] += -1 if h % (2 * _BUCKETS) >= _BUCKETS else 1
            n_feat[b] += 1
            distinct[b].add(feat)
    want = {b: (signed[b], n_feat[b], len(distinct[b])) for b in n_feat}
    assert got == want


def test_semdedup_pairs_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.vectorq import vector_semdedup_pairs

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in vector_semdedup_pairs(spark, sf_dir).collect()
    }
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples(index=False)}
    for vid in sorted(vecs):
        if vid % 10 == 0:
            vecs[vid + 100000] = [x * 2.0 for x in vecs[vid]]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot = dot + x * y
        for x in a:
            na = na + x * x
        for y in b:
            nb = nb + y * y
        return _round6(dot / (math.sqrt(na) * math.sqrt(nb)))

    seed_ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:_SEM_C]
    cents = {i: vecs[i] for i in seed_ids}
    clusters: dict[int, list[int]] = defaultdict(list)
    for vid, v in vecs.items():
        _, best_cid = min((-cos(v, cv), cid) for cid, cv in cents.items())
        clusters[best_cid].append(vid)
    want = {}
    for members in clusters.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                c = cos(vecs[a], vecs[b])
                if c >= _SEM_T:
                    want[(a, b)] = c
    assert got == want
