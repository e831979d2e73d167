"""IVF ANN internals: deterministic seeding, broadcast GEMM assignment,
Lloyd refinement, and recall against the exact brute-force top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cyrela_etl_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    kmeans_refine,
    seed_centroids,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_seed_centroids_deterministic_and_spread(emb):
    a = seed_centroids(emb, 16)
    b = seed_centroids(emb, 16)
    assert a == b
    ids = [cid for cid, _ in a]
    assert len(ids) == 16 and len(set(ids)) == 16
    # md5-ordered sample spreads across the id space, not the first-N prefix
    n = emb.count()
    assert max(ids) > n // 4


def test_kmeans_refine_keeps_cids_and_dim(emb):
    seeds = seed_centroids(emb, 8)
    refined = kmeans_refine(emb, seeds, iters=1)
    assert [c for c, _ in refined] == [c for c, _ in seeds]
    assert all(len(v) == len(seeds[0][1]) for _, v in refined)
    # refinement moved at least one centroid off its seed vector
    assert any(rv != sv for (_, rv), (_, sv) in zip(refined, seeds))


def test_ivf_recall_against_exact(emb, queries):
    k = 5
    exact = cosine_topk(emb, queries, k=k)
    approx = ivf_topk(emb, queries, k=k, n_centroids=8, nprobe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # probing half the lists must recover a solid fraction of true neighbors
    assert len(a & e) / len(e) >= 0.5, (len(a & e), len(e))


def test_ivf_plan_size_independent_of_centroids(emb, queries):
    """The plan must not embed centroid literals: its string size stays
    flat as n_centroids grows (the round-2 design embedded C×dim doubles
    into codegen)."""
    p4 = ivf_topk(emb, queries, k=3, n_centroids=4)._jdf.queryExecution().toString()
    p32 = ivf_topk(emb, queries, k=3, n_centroids=32)._jdf.queryExecution().toString()
    assert len(p32) < len(p4) * 1.5, (len(p4), len(p32))
