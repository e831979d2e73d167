"""Model check for search_hybrid_rrf (queries/textq.py) — model-check
wave 3. Hybrid retrieval is the composition with the most moving parts
in the text family: a BM25-lite ranking, an exact-cosine ranking, a
full-outer rank fusion with null-coalesced reciprocal terms, and a
global top-20 cut. This Python model recomputes ALL of it from the
parquet — integer BM25 scores, sequential-fold cosines with HALF_UP
rounding before ranking, 1/(60+r) fusion in the engine's operand order —
so the fused ranking is pinned end-to-end, not just per retriever.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_TERMS = ["data", "table", "join", "stream"]
_K_RRF, _DEPTH, _TOPN, _QVEC = 60, 100, 20, 0


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _bm25_ranks(docs: list[tuple[int, str]]) -> dict[int, int]:
    n_docs = len(docs)
    toks = {i: _toks(t) for i, t in docs}
    total_len = sum(len(v) for v in toks.values())
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in _TERMS}
    scores: dict[int, int] = {}
    for i, v in toks.items():
        tf_map = Counter(tok for tok in v if tok in _TERMS)
        if not tf_map:
            continue
        dl = len(v)
        scores[i] = sum(
            (10**6 * (2 * n_docs - 2 * dfreq[t] + 1) * 22 * tf * total_len)
            // ((2 * dfreq[t] + 1) * (10 * tf * total_len + 3 * total_len + 9 * dl * n_docs))
            for t, tf in tf_map.items()
        )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_DEPTH]
    return {doc_id: r + 1 for r, (doc_id, _) in enumerate(ranked)}


def _cosine_ranks(vecs: dict[int, list[float]], qid: int) -> dict[int, int]:
    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def l2(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    q = vecs[qid]
    cos = {
        vid: _round6(fold_dot(q, v) / (l2(q) * l2(v)))
        for vid, v in vecs.items()
        if vid != qid
    }
    ranked = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:_DEPTH]
    return {vid: r + 1 for r, (vid, _) in enumerate(ranked)}


def test_hybrid_rrf_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import search_hybrid_rrf

    got = [
        (r["doc_id"], r["rank"], r["r_text"], r["r_vec"], r["rrf_score"])
        for r in search_hybrid_rrf(spark, sf_dir).collect()
    ]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    doc_rows = [(int(d), t) for d, t in docs.itertuples(index=False)]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    doc_ids = {d for d, _ in doc_rows}
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples(index=False)
        if int(r.vec_id) in doc_ids
    }
    rt = _bm25_ranks(doc_rows)
    rv = _cosine_ranks(vecs, _QVEC)
    fused = {
        d: (1.0 / (_K_RRF + rt[d]) if d in rt else 0.0)
        + (1.0 / (_K_RRF + rv[d]) if d in rv else 0.0)
        for d in set(rt) | set(rv)
    }
    ranked = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPN]
    want = [
        (d, r + 1, rt.get(d), rv.get(d), score)
        for r, (d, score) in enumerate(ranked)
    ]
    assert sorted(got) == sorted(want)
