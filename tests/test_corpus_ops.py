"""Corpus-preparation operators: chunking boundaries, split stability,
PII redaction, token-budget packing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cyrela_etl_spark.operators.corpus import (
    chunk_documents,
    dataset_split,
    pack_token_budget,
    redact_pii,
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_chunk_documents_boundaries(spark):
    text = " ".join(f"t{i}" for i in range(100))  # 100 tokens
    df = _df(spark, [(1, text), (2, "only three tokens")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=64, overlap=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: ceil((100-16)/48) = 2 chunks: [0,64) and [48,100) -> 64, 52 tokens
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_index"])
    assert [r["n_chunk_tokens"] for r in c1] == [64, 52]
    assert c1[0]["chunk_text"].split()[:2] == ["t0", "t1"]
    assert c1[1]["chunk_text"].split()[0] == "t48"  # overlap region restarts
    # short doc: exactly one (short) chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    df = _df(spark, [(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_size=32, overlap=32)


def test_dataset_split_stable_under_growth(spark):
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s_small = {r["doc_id"]: r["split"] for r in dataset_split(small).collect()}
    s_big = {r["doc_id"]: r["split"] for r in dataset_split(big).collect()}
    # adding documents never reassigns earlier ones
    assert all(s_big[k] == v for k, v in s_small.items())
    # rough proportions hold at n=1000
    from collections import Counter

    c = Counter(s_big.values())
    assert 700 < c["train"] < 900 and c["val"] > 40 and c["test"] > 40


def test_redact_pii_counts_and_scrubs(spark):
    df = _df(
        spark,
        [
            (1, "mail me at a.b+c@example.co.uk or call +15550100123 today"),
            (2, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "@" not in out[1]["redacted_text"]
    assert "5550100123" not in out[1]["redacted_text"]
    assert out[1]["redacted_text"].count("[PII]") == 2
    assert out[2]["n_email"] == 0 and out[2]["redacted_text"] == "no pii here"


def test_pack_token_budget_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_token_budget(docs, budget=512, n_shards=4)
    pdf = out.toPandas()
    assert set(pdf["shard"].unique()) <= {0, 1, 2, 3}
    # within a shard, bin_id is non-decreasing in doc_id order and each
    # bin's first token offset is within the budget range
    for _, grp in pdf.sort_values("doc_id").groupby("shard"):
        bins = grp["bin_id"].to_numpy()
        assert (bins[1:] >= bins[:-1]).all()
        cum = grp["n_tokens"].cumsum() - grp["n_tokens"]
        assert ((cum // 512) == grp["bin_id"]).all()


def test_connected_components_multi_hop_vs_union_find(spark, sf_dir):
    """Min-label propagation must equal a reference union-find on the
    DENSE simhash pair graph (multi-hop chains through random 16-bit
    collisions — transitivity genuinely exercised, unlike clique blocks)."""
    from cyrela_etl_spark.operators.dedup import connected_components, simhash_pairs
    from cyrela_etl_spark.queries.textq import corpus

    pairs = simhash_pairs(corpus(spark, sf_dir), bits=16, max_hamming=2)
    edges = [(r["id_a"], r["id_b"]) for r in pairs.collect()]

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {v: find(v) for v in parent}
    # canonicalize: min id per component
    comp_min: dict[int, int] = {}
    for v, r in expect.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    expect = {v: comp_min[find(v)] for v in parent}

    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == expect
