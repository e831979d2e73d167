"""Model check for vector_power_iteration_pca (queries/vectorq.py) —
model-check wave 3, aimed squarely at the round-12 plan diet: the query's
base relation was persisted and its per-round s-vector reuse re-planned
(23 -> 5 shuffle sites), and persistence changes are exactly the kind of
refactor a lineage bug could hide in. This plain-Python replay of the
two power rounds (decimal per-term rounding, exact Decimal sums, the
single IEEE division per component) is the independent witness that the
re-planned query still computes the same numbers bit-for-bit.

The model follows the operator's no-float-fold discipline literally:
  dr(vec) = sum_dim Decimal(round(val*w, 9))   -- exact decimal sum
  s(dim)  = sum_vec Decimal(round(val*dr, 6))  -- exact decimal sum
  n2      = float(sum s^2)                     -- exact decimal -> double
  w'(dim) = round(float(s)/sqrt(n2), 9)        -- one IEEE division
with Spark's round(double, n) modeled as Decimal(repr(x)) HALF_UP
(BigDecimal.valueOf takes the shortest decimal repr — ADVICE r10).
"""

from __future__ import annotations
import pytest

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_DIM = 64


def _round_double(x: float, places: int) -> Decimal:
    q = Decimal(1).scaleb(-places)
    return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)


def _power_round(vecs: dict[int, list[float]], w: list[float]):
    dr = {
        vid: float(sum(_round_double(v[d] * w[d], 9) for d in range(_DIM)))
        for vid, v in vecs.items()
    }
    s = [
        sum((_round_double(v[d] * dr[vid], 6) for vid, v in vecs.items()), Decimal(0))
        for d in range(_DIM)
    ]
    n2 = float(sum(x * x for x in s))
    lam = math.sqrt(n2)
    w_next = [float(_round_double(float(s[d]) / math.sqrt(n2), 9)) for d in range(_DIM)]
    return w_next, lam


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
def test_power_iteration_pca_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.vectorq import vector_power_iteration_pca

    row = vector_power_iteration_pca(spark, sf_dir).collect()[0]
    got = (row["lambda_1"], *[row[f"c{d}"] for d in range(8)])

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]  # float32 widens exactly
        for r in emb.itertuples(index=False)
    }
    w0 = [1.0] + [0.0] * (_DIM - 1)
    w1, _ = _power_round(vecs, w0)
    w2, lam2 = _power_round(vecs, w1)
    want = (
        float(_round_double(lam2, 6)),
        *[float(_round_double(w2[d], 6)) for d in range(8)],
    )
    assert got == want
