"""Model checks for the exact-integer retrieval/LM scorers
(operators/text.py: bm25_lite_topk, bigram_lm_scores) — model-check wave 3.

Both operators were designed rational precisely so they COULD be checked
bit-for-bit by an independent implementation; these tests supply that
second implementation in plain Python (arbitrary-precision ints, so the
DECIMAL(38,0) numerator discipline on the Spark side is exercised against
a reference that cannot overflow).

What these pin beyond the `text_bm25_topk` / `text_lm_score` oracle rows:

- bm25_lite_topk: the cleared-denominator Robertson formula on
  hypothesis-random corpora (tf > 1, multi-term docs, absent terms), the
  corpus totals (N counts ALL docs including non-matching ones; L sums
  ALL doc lengths), the deterministic (score desc, doc_id asc) top-k cut,
  and the rank column.
- bigram_lm_scores: word_grams(2) multiset bigrams, the add-one-smoothed
  ppm fold (c1 = corpus occurrences of the PREFIX word as a bigram start,
  vocab = distinct tokens over ALL docs, including bigram-less ones), the
  absent-row contract for docs with < 2 tokens, and the final IEEE
  division avg_prob_ppm = sum_ppm / n_bigrams.
"""

from __future__ import annotations
import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DOC = st.lists(st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=0, max_size=12)
_DOCS = st.lists(_DOC, min_size=1, max_size=8)


def _model_bm25(docs: list[list[str]], terms: list[str], k: int):
    n_docs = len(docs)
    total_len = sum(len(d) for d in docs)
    per_doc: dict[int, tuple[int, int]] = {}
    dfreq = {t: sum(1 for d in docs if t in d) for t in terms}
    for i, d in enumerate(docs):
        dl = len(d)
        tf_map = Counter(tok for tok in d if tok in terms)
        if not tf_map:
            continue
        score = 0
        for t, tf in tf_map.items():
            df = dfreq[t]
            num = 10**6 * (2 * n_docs - 2 * df + 1) * 22 * tf * total_len
            den = (2 * df + 1) * (10 * tf * total_len + 3 * total_len + 9 * dl * n_docs)
            score += num // den
        per_doc[i] = (len(tf_map), score)
    ranked = sorted(per_doc.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
    return {
        doc_id: (rank + 1, n_terms, score)
        for rank, (doc_id, (n_terms, score)) in enumerate(ranked)
    }


@given(docs=_DOCS, terms=st.sampled_from([["a"], ["a", "dd"], ["b", "c", "e"]]),
       k=st.sampled_from([2, 5]))
@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bm25_lite_topk_matches_python_model(spark, docs, terms, k):
    from cyrela_etl_spark.operators.text import bm25_lite_topk

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    got = {
        r["doc_id"]: (r["rank"], r["n_terms"], r["score_ppm"])
        for r in bm25_lite_topk(df, terms, k=k).collect()
    }
    assert got == _model_bm25(docs, terms, k)


def _model_bigram_lm(docs: list[list[str]]):
    all_bigrams: list[tuple[int, str]] = []
    for i, d in enumerate(docs):
        for j in range(len(d) - 1):
            all_bigrams.append((i, f"{d[j]} {d[j + 1]}"))
    c2 = Counter(bg for _, bg in all_bigrams)
    c1 = Counter(bg.split(" ")[0] for _, bg in all_bigrams)
    vocab = len({tok for d in docs for tok in d})
    want: dict[int, tuple[int, int, float]] = {}
    for i, d in enumerate(docs):
        ppms = [
            (10**6 * (c2[bg] + 1)) // (c1[bg.split(" ")[0]] + vocab)
            for doc_id, bg in all_bigrams
            if doc_id == i
        ]
        if ppms:
            want[i] = (len(ppms), sum(ppms), sum(ppms) / len(ppms))
    return want


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(docs=_DOCS)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bigram_lm_scores_match_python_model(spark, docs):
    from cyrela_etl_spark.operators.text import bigram_lm_scores

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_ppm"], r["avg_prob_ppm"])
        for r in bigram_lm_scores(df).collect()
    }
    assert got == _model_bigram_lm(docs)
