"""Model checks for the iterative graph operators not covered by
test_graph_model.py: integer PageRank and deterministic synchronous
label propagation (operators/graph.py) vs plain-Python references over
hypothesis graphs. Both are EXACT integer arithmetic by design (ppb
ranks, truncating divisions; struct-max label votes), so the models are
bit-faithful, not approximate.

What these pin beyond the existing fixed-graph unit tests:

- PageRank: r0 = scale div N, base = ((100−d)·(scale div N)) div 100,
  per-edge contribution r div deg, rank' = base + (d·Σ) div 100 — every
  division truncating on positive longs (SQL div == Python //), over
  arbitrary small graphs and 1–3 iterations;
- LPA: synchronous rounds where each node adopts the most frequent
  neighbor label with ties to the SMALLEST label (max over
  (cnt, −label) structs), plus the final community-size join.

Inputs follow the canonical pair convention (id_a < id_b, distinct) —
the same contract the triangle model records for pair-graph inputs.
"""

from __future__ import annotations
import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EDGES = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).map(lambda t: (min(t), max(t))).filter(
        lambda t: t[0] != t[1]
    ),
    min_size=1,
    max_size=12,
    unique=True,
)


def _neighbors(edges: list[tuple[int, int]]) -> dict[int, list[int]]:
    nbr: dict[int, list[int]] = {}
    for a, b in set(edges):
        nbr.setdefault(a, []).append(b)
        nbr.setdefault(b, []).append(a)
    return nbr


def _model_pagerank(edges, iterations, scale=1_000_000_000, damping=85):
    nbr = _neighbors(edges)
    n = len(nbr)
    r = {v: scale // n for v in nbr}
    base = ((100 - damping) * (scale // n)) // 100
    for _ in range(iterations):
        s = {v: 0 for v in nbr}
        for u, vs in nbr.items():
            c = r[u] // len(vs)
            for v in vs:
                s[v] += c
        r = {v: base + (damping * s[v]) // 100 for v in nbr}
    return {v: (len(nbr[v]), r[v]) for v in nbr}


def _model_lpa(edges, iterations):
    nbr = _neighbors(edges)
    lab = {v: v for v in nbr}
    for _ in range(iterations):
        new = {}
        for v, vs in nbr.items():
            votes = Counter(lab[u] for u in vs)
            # most frequent, ties to smallest label
            new[v] = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        lab = new
    sizes = Counter(lab.values())
    return {v: (lab[v], sizes[lab[v]]) for v in nbr}


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(edges=_EDGES, iterations=st.sampled_from([1, 2, 3]))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_integer_pagerank_matches_python_model(spark, edges, iterations):
    from cyrela_etl_spark.operators.graph import integer_pagerank

    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(2)
    got = {
        r["node"]: (r["degree"], r["rank_ppb"])
        for r in integer_pagerank(df, iterations=iterations).collect()
    }
    assert got == _model_pagerank(edges, iterations)
    spark.catalog.clearCache()  # operator persists edge/degree tables (cache contract)


def _model_link_prediction(edges, top_n, scale=1_000_000):
    nbr = _neighbors(edges)
    deg = {v: len(vs) for v, vs in nbr.items()}
    scored: dict[tuple[int, int], list[int]] = {}
    for z, vs in nbr.items():
        term = scale // deg[z]
        for x in vs:
            for y in vs:
                if x < y:
                    s = scored.setdefault((x, y), [0, 0])
                    s[0] += 1
                    s[1] += term
    existing = set(edges)
    cands = [
        (lo, hi, n, ra)
        for (lo, hi), (n, ra) in scored.items()
        if (lo, hi) not in existing
    ]
    cands.sort(key=lambda t: (-t[3], -t[2], t[0], t[1]))
    return cands[:top_n]


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(edges=_EDGES, top_n=st.sampled_from([3, 50]))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_link_prediction_matches_python_model(spark, edges, top_n):
    """RA index as exact ppm integer sums, the wedge pair emission
    (once per common neighbor), the anti-join against existing edges,
    and the total (ra desc, n_common desc, lo, hi) order incl. the
    top_n cut."""
    from cyrela_etl_spark.operators.graph import link_prediction

    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(2)
    got = [
        (r["lo"], r["hi"], r["n_common"], r["ra_ppm"])
        for r in link_prediction(df, top_n=top_n).collect()
    ]
    assert got == _model_link_prediction(edges, top_n)
    spark.catalog.clearCache()


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(edges=_EDGES, iterations=st.sampled_from([1, 2, 3]))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_label_propagation_matches_python_model(spark, edges, iterations):
    from cyrela_etl_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(2)
    got = {
        r["node"]: (r["community"], r["community_size"])
        for r in label_propagation(df, iterations=iterations).collect()
    }
    assert got == _model_lpa(edges, iterations)
    spark.catalog.clearCache()
