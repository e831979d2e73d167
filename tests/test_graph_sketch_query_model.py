"""Model checks for three inline iterative/sketch queries whose DuckDB
oracles MIRROR the Spark construction (same unrolled SQL shape), so a
shared misconception could pass both sides — model-check wave 3.

Each test re-derives the algorithm independently in plain Python over the
same sf0.001 parquet (pandas read, no Spark in the model path):

- graph_bfs_frontier: set-based BFS (hop-1 / hop-2 with visited exclusion)
  from the 3 lowest-id seeds of the duplicate-pair graph, including the
  Python re-derivation of the edge set itself (md5 of normalized text +
  md5 of the 6-token prefix, pairs by shared key).
- graph_kcore_peel: two peel rounds (drop deg < 2, induce, recount) with
  multiset degree counting.
- scale_countmin_estimate: a d=3 x w=32 count-min sketch built with
  hashlib over the event key stream; estimates = min over rows; top-10 by
  true count.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd

_SEEDS = 3
_K = 2
_D, _W = 3, 32


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _corpus_rows(sf_dir: str) -> list[tuple[int, str]]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    base = [(int(d), t) for d, t in docs.itertuples(index=False)]
    return (
        base
        + [(d + 100000, t) for d, t in base if d % 10 == 0]
        + [(d + 200000, t + " zyx extra") for d, t in base if d % 7 == 0]
    )


def _dup_edges_model(sf_dir: str) -> set[tuple[int, int]]:
    rows = _corpus_rows(sf_dir)
    by_exact: dict[str, list[int]] = {}
    by_prefix: dict[str, list[int]] = {}
    for doc_id, text in rows:
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        by_exact.setdefault(_md5(norm), []).append(doc_id)
        by_prefix.setdefault(_md5(" ".join(_toks(text)[:6])), []).append(doc_id)
    edges: set[tuple[int, int]] = set()
    for groups in (by_exact, by_prefix):
        for ids in groups.values():
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    edges.add((a, b))
    return edges


def test_bfs_frontier_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import graph_bfs_frontier

    got = {
        r["seed"]: (r["n_hop1"], r["n_hop2"])
        for r in graph_bfs_frontier(spark, sf_dir).collect()
    }
    edges = _dup_edges_model(sf_dir)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for seed in sorted(adj)[:_SEEDS]:
        hop1 = {v for v in adj[seed] if v != seed}
        hop2 = {w for v in hop1 for w in adj[v] if w != seed} - hop1
        want[seed] = (len(hop1), len(hop2))
    assert got == want


def test_kcore_peel_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import graph_kcore_peel

    got = {
        r["round"]: (r["n_nodes"], r["n_edges"])
        for r in graph_kcore_peel(spark, sf_dir).collect()
    }

    def stats(e: set[tuple[int, int]]) -> tuple[int, int]:
        return len({v for ab in e for v in ab}), len(e)

    def peel(e: set[tuple[int, int]]) -> set[tuple[int, int]]:
        deg = Counter(v for ab in e for v in ab)
        keep = {v for v, d in deg.items() if d >= _K}
        return {(a, b) for a, b in e if a in keep and b in keep}

    e0 = _dup_edges_model(sf_dir)
    e1 = peel(e0)
    e2 = peel(e1)
    assert got == {0: stats(e0), 1: stats(e1), 2: stats(e2)}


def test_countmin_estimate_matches_python_sketch(spark, sf_dir):
    from cyrela_etl_spark.queries.relational import scale_countmin_estimate

    got = [
        (r["key"], r["true_count"], r["cms_estimate"], r["overestimate"])
        for r in scale_countmin_estimate(spark, sf_dir).collect()
    ]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "user_id"]]
    keys = [f"{et}|{int(uid) % 50}" for et, uid in ev.itertuples(index=False)]

    def bucket(r: int, key: str) -> int:
        return int(_md5(f"cms{r}:{key}")[:15], 16) % _W

    counters: Counter = Counter()
    for key in keys:
        for r in range(_D):
            counters[(r, bucket(r, key))] += 1
    true = Counter(keys)
    want = [
        (k, c, est, est - c)
        for k, c in sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        for est in [min(counters[(r, bucket(r, k))] for r in range(_D))]
    ]
    assert got == want
