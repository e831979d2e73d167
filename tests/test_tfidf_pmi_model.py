"""Model checks for the sparse text-statistics queries (queries/textq.py:
text_tfidf_doc_pairs, text_pmi_collocations) — model-check wave 3.

Both carry their weights in exact integer/rational space precisely so an
independent implementation can replay them; the Python models here use
arbitrary-precision ints for every sum (the DECIMAL(38,0) discipline),
converting to IEEE doubles only at the same final sqrt/division/ln sites
as the engine, in the same operation order.

What these pin beyond the oracle rows:
- tfidf: the three-way df prune (df>=2, relative df*10<=N, absolute
  df<=500), the rational idf weight w = tf*((100N) div df), exact-int
  dot/norm sums (values that can exceed 2^53, exercising the
  decimal->double correct rounding on the engine side vs float(int) on
  the model side), and the filter on the ROUNDED cosine.
- pmi: multiset bigram/unigram counts, the >=5 pair floor, and the fixed
  left-assoc division chain feeding one ln.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_SCALE, _DF_DIV, _MIN_COS, _DF_CAP = 100, 10, 0.3, 500


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _corpus_rows(sf_dir: str) -> list[tuple[int, str]]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    base = [(int(d), t) for d, t in docs.itertuples(index=False)]
    return (
        base
        + [(d + 100000, t) for d, t in base if d % 10 == 0]
        + [(d + 200000, t + " zyx extra") for d, t in base if d % 7 == 0]
    )


def test_tfidf_doc_pairs_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_tfidf_doc_pairs

    got = {
        (r["doc_a"], r["doc_b"]): (r["dot"], r["cosine"])
        for r in text_tfidf_doc_pairs(spark, sf_dir).collect()
    }
    rows = _corpus_rows(sf_dir)
    n = len(rows)
    tf: dict[tuple[int, str], int] = Counter()
    for doc_id, text in rows:
        for tok in _toks(text):
            tf[(doc_id, tok)] += 1
    dfreq = Counter(tok for _, tok in tf)
    postings: dict[str, list[tuple[int, int]]] = {}
    norms: dict[int, int] = Counter()
    for (doc_id, tok), f in tf.items():
        df = dfreq[tok]
        if df >= 2 and df * _DF_DIV <= n and df <= _DF_CAP:
            w = f * ((_SCALE * n) // df)
            postings.setdefault(tok, []).append((doc_id, w))
            norms[doc_id] += w * w
    dots: dict[tuple[int, int], int] = Counter()
    for plist in postings.values():
        plist.sort()
        for i, (da, wa) in enumerate(plist):
            for db, wb in plist[i + 1 :]:
                dots[(da, db)] += wa * wb
    want = {}
    for (da, db), dot in dots.items():
        cos = _round6(float(dot) / (math.sqrt(float(norms[da])) * math.sqrt(float(norms[db]))))
        if cos >= _MIN_COS:
            want[(da, db)] = (float(dot), cos)
    assert got == want


def test_pmi_collocations_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_pmi_collocations

    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
        for r in text_pmi_collocations(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
    c1: Counter = Counter()
    c2: Counter = Counter()
    for text in docs:
        toks = _toks(text)
        c1.update(toks)
        c2.update(zip(toks, toks[1:]))
    n1, n2 = sum(c1.values()), sum(c2.values())
    want = {}
    for (w1, w2), n_pair in c2.items():
        if n_pair >= 5:
            ratio = (n_pair / c1[w1]) * (n1 / n2) * (n1 / c1[w2])
            want[(w1, w2)] = (n_pair, _round6(math.log(ratio)))
    assert got == want
