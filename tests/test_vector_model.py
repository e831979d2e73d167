"""Model check for exact cosine top-k (operators/similarity.py): random
small integer vector corpora through ``cosine_topk`` vs a plain-Python
reference that mirrors the operator's exact floating-point evaluation —
sequential left-to-right folds for dot and norms, one division, then
HALF_UP rounding to 6 digits (Spark's ``round``; Python's builtin round
is half-even, so the model quantizes through Decimal). Same-id exclusion
(vec_id != query_id) and the (score desc, vec_id asc) tie order are
asserted on adversarial shapes: duplicate vectors (exact score ties),
query ids colliding with data ids, parallel/anti-parallel vectors
(cosine exactly ±1). Vectors are generated non-zero — a zero norm is
NaN territory the operator does not contract for.
"""

from __future__ import annotations
import pytest

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VEC = st.lists(st.integers(-3, 3), min_size=3, max_size=3).filter(
    lambda v: any(x != 0 for x in v)
)
_DATA = st.lists(_VEC, min_size=1, max_size=10)
_QIDS = st.lists(st.integers(0, 12), min_size=1, max_size=2, unique=True)


def _cos_like_spark(q, v):
    dot = 0.0
    for x, y in zip(q, v):
        dot = dot + x * y
    na = 0.0
    for x in q:
        na = na + x * x
    nb = 0.0
    for x in v:
        nb = nb + x * x
    c = dot / (math.sqrt(na) * math.sqrt(nb))
    # Spark round(double, 6) goes through BigDecimal.valueOf, which takes
    # Double.toString's SHORTEST decimal repr — model with Decimal(repr(c)),
    # not Decimal(c) (the exact binary expansion), which can HALF_UP the
    # other way when the exact value sits just below a halfway boundary
    # whose shortest repr lands exactly on it (ADVICE r10).
    return float(Decimal(repr(c)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


@given(data=_DATA, qids=_QIDS, k=st.sampled_from([1, 3, 5]))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
def test_cosine_topk_matches_python_model(spark, data, qids, k):
    from cyrela_etl_spark.operators.similarity import cosine_topk

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(data)]
    ddf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # queries reuse data vectors cyclically so id collisions and exact
    # duplicate vectors both occur
    qrows = [(qid, rows[qid % len(rows)][1]) for qid in qids]
    qdf = spark.createDataFrame(qrows, "query_id long, embedding array<double>")
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in cosine_topk(ddf, qdf, k=k).collect()
    )
    want = []
    for qid, qv in qrows:
        scored = sorted(
            ((-_cos_like_spark(qv, v), i) for i, v in rows if i != qid),
        )[:k]
        want.extend(
            (qid, rank, vid, -negcos)
            for rank, (negcos, vid) in enumerate(scored, start=1)
        )
    assert got == sorted(want)
