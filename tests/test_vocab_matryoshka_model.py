"""Model checks for text_hapax_heaps, text_vocab_growth, and
vector_matryoshka_topk — model-check wave 3.

- hapax/Heaps and vocabulary growth: Counter models of the per-language
  type/token statistics and the first-occurrence bucketed cumulative
  vocabulary curve.
- Matryoshka top-k: the two-stage ANN replayed in Python — fold-cosine
  over the 16-dim prefix with round-6 and (cos desc, vec_id asc) ties for
  the candidate cut, then the exact full-dim rerank over exactly those
  candidates. Pins the stage hand-off (a candidate dropped at the coarse
  boundary by a tie would show here).
"""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_BUCKET = 5
_K, _N_QUERIES, _COARSE, _REFINE = 5, 8, 16, 10


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_hapax_heaps_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import text_hapax_heaps

    got = {
        r["lang"]: (r["n_tokens"], r["n_types"], r["n_hapax"],
                    r["type_token_ratio"], r["hapax_ratio"])
        for r in text_hapax_heaps(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["lang", "text"]]
    per_lang: dict[str, Counter] = {}
    for r in docs.itertuples(index=False):
        per_lang.setdefault(r.lang, Counter()).update(_toks(r.text))
    want = {}
    for lang, tc in per_lang.items():
        n_tokens = sum(tc.values())
        n_types = len(tc)
        n_hapax = sum(1 for c in tc.values() if c == 1)
        want[lang] = (n_tokens, n_types, n_hapax, n_types / n_tokens, n_hapax / n_types)
    assert got == want


def test_vocab_growth_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import text_vocab_growth

    got = {
        (r["lang"], r["bucket"]): (r["new_types"], r["vocab_size"])
        for r in text_vocab_growth(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["lang", "doc_id", "text"]]
    first_doc: dict[tuple[str, str], int] = {}
    for r in docs.itertuples(index=False):
        for t in _toks(r.text):
            key = (r.lang, t)
            if key not in first_doc or r.doc_id < first_doc[key]:
                first_doc[key] = int(r.doc_id)
    per_bucket: Counter = Counter()
    for (lang, _), fd in first_doc.items():
        per_bucket[(lang, (fd // _BUCKET) * _BUCKET)] += 1
    want = {}
    for lang in {k[0] for k in per_bucket}:
        cum = 0
        for bucket in sorted(b for l, b in per_bucket if l == lang):
            n = per_bucket[(lang, bucket)]
            cum += n
            want[(lang, bucket)] = (n, cum)
    assert got == want


def test_matryoshka_topk_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.vectorq import vector_matryoshka_topk

    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in vector_matryoshka_topk(spark, sf_dir).collect()
    }
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples(index=False)}

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
        q = vecs[qid]
        coarse = sorted(
            ((-fold_cos(q[:_COARSE], v[:_COARSE]), vid) for vid, v in vecs.items() if vid != qid)
        )[: _K * _REFINE]
        exact = sorted(((-fold_cos(q, vecs[vid]), vid) for _, vid in coarse))[:_K]
        for rank, (neg_cos, vid) in enumerate(exact):
            want[(qid, rank + 1)] = (vid, -neg_cos)
    assert got == want
