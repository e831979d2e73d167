"""Model check for the dedup family's deterministic core: n-gram Jaccard
pairs vs a plain-Python set model (the round-9/10 model-test pattern).
MinHash/SimHash are probabilistic (their guarantees are measured by the
recall curves in README); Jaccard is the exact ground truth they
approximate, so its shingle extraction, pair canonicalization
(id_a < id_b), threshold boundary (>=, hit exactly at ratios like 1/2)
and the short-document single-shingle rule are all model-pinned here."""

from __future__ import annotations
import pytest

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DOC = st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=6)
_DOCS = st.lists(_DOC, min_size=1, max_size=8)


def _model_shingles(text: str, n: int) -> set[str]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}  # whole-doc shingle: no doc is unrepresentable
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@given(docs=_DOCS, n=st.sampled_from([1, 2]), threshold=st.sampled_from([0.0, 0.5]))
@settings(
    max_examples=10,  # the unblocked self-join is the priciest per-example
    deadline=None,    # model op here (~5s each); 10 examples still walk all
    suppress_health_check=[HealthCheck.too_slow],  # three parameter dims
)
@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
def test_ngram_jaccard_pairs_matches_set_model(spark, docs, n, threshold):
    from cyrela_etl_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            df, n=n, threshold=threshold, allow_full_scan=True
        ).collect()
    }
    sh = {i: _model_shingles(t, n) for i, t in rows}
    want = set()
    for i in sh:
        for j in sh:
            if i < j and sh[i] and sh[j]:
                jac = len(sh[i] & sh[j]) / len(sh[i] | sh[j])
                if jac >= threshold:
                    want.add((i, j, jac))
    assert got == want
