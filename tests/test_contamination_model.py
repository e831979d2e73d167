"""Model check for the eval-set decontamination report
(operators/contamination.py) vs a plain-Python set reference (the
round-9/10 model-test pattern): shingle extraction (including the
whole-doc shingle for docs shorter than n and the EMPTY set for
zero-token docs), the absent-row contract for zero-overlap training
docs, the distinct-shingle and distinct-eval-doc hit counts, and the
exact-int contamination ratio. Both join modes (broadcast and shuffle)
must produce identical reports.
"""

from __future__ import annotations
import pytest

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DOC = st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=8)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _shingles(text: str, n: int) -> set[str]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@given(
    train=_CORPUS,
    eval_docs=_CORPUS,
    n=st.sampled_from([2, 3]),
    broadcast_eval=st.booleans(),
)
@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_contamination_report_matches_set_model(spark, train, eval_docs, n, broadcast_eval):
    from cyrela_etl_spark.operators.contamination import contamination_report

    trows = [(i, " ".join(t)) for i, t in enumerate(train)]
    erows = [(i, " ".join(t)) for i, t in enumerate(eval_docs)]
    tdf = spark.createDataFrame(trows, "doc_id long, text string").repartition(2)
    edf = spark.createDataFrame(erows, "doc_id long, text string").repartition(2)
    got = {
        r["train_id"]: (
            r["n_shingles"],
            r["n_overlap_shingles"],
            r["n_eval_docs"],
            r["contamination_ratio"],
        )
        for r in contamination_report(tdf, edf, n=n, broadcast_eval=broadcast_eval).collect()
    }
    esh = {i: _shingles(t, n) for i, t in erows}
    eval_union = set().union(*esh.values()) if esh else set()
    want = {}
    for i, t in trows:
        sh = _shingles(t, n)
        overlap = sh & eval_union
        if not overlap:
            continue  # zero-overlap training docs are absent (inner join)
        n_eval = sum(1 for s in esh.values() if s & sh)
        want[i] = (len(sh), len(overlap), n_eval, len(overlap) / len(sh))
    assert got == want
