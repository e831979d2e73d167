"""Model checks for the corpus-curation operators (operators/corpus.py):
chunking, deterministic splits, token-budget packing, exact stratified
sampling, and priority-weighted sampling vs plain-Python references (the
round-9/10 model-test pattern). Every one of these is a pure function of
md5 (functions/hashing.py hex-prefix contract) and exact integer
arithmetic, so a bit-faithful model exists.

What these pin beyond the oracle twins:

- chunk_documents: the ceil((n−overlap)/step) chunk count, the ≥1-chunk
  floor for short/EMPTY documents, the [i·step, i·step+chunk_size) token
  windows and the trimmed final chunk;
- dataset_split: bucket = md5-hash(id) mod 100 and the train/val/test
  threshold layout (a document's split is a property of its id alone);
- pack_token_budget: shard = hash mod n_shards, the id-ordered per-shard
  running sum, and bin = floor((cumsum − n_tokens)/budget) — a doc bins
  where its FIRST token falls;
- stratified_sample: per-stratum (hash asc, id asc) rank and the exact
  ceil(n·pct/100) cut — EXACT fractions, not Bernoulli expectation;
- weighted_priority_sample: priority = hash(id) div weight (integer
  division), global (priority asc, id asc) top-n and its rank column.
"""

from __future__ import annotations
import pytest

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DOC = st.lists(st.sampled_from(["a", "b", "cc", "dd", "eee"]), min_size=0, max_size=12)
_DOCS = st.lists(_DOC, min_size=1, max_size=8)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(docs=_DOCS, chunk_size=st.sampled_from([4, 6]), overlap=st.sampled_from([0, 2]))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_chunk_documents_matches_python_model(spark, docs, chunk_size, overlap):
    from cyrela_etl_spark.operators.corpus import chunk_documents

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    got = sorted(
        (r["doc_id"], r["chunk_index"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_size=chunk_size, overlap=overlap).collect()
    )
    step = chunk_size - overlap
    want = []
    for i, text in rows:
        toks = _toks(text)
        n_chunks = max(math.ceil((len(toks) - overlap) / step), 1)
        for ci in range(n_chunks):
            piece = toks[ci * step : ci * step + chunk_size]
            want.append((i, ci, len(piece), " ".join(piece)))
    assert got == sorted(want)


@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=20, unique=True))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_dataset_split_matches_python_model(spark, ids):
    from cyrela_etl_spark.operators.corpus import dataset_split

    df = spark.createDataFrame([(i, "x") for i in ids], "doc_id long, text string")
    got = {(r["doc_id"], r["bucket"], r["split"]) for r in dataset_split(df).collect()}
    want = set()
    for i in ids:
        b = _h60(str(i)) % 100
        want.add((i, b, "train" if b < 80 else "val" if b < 90 else "test"))
    assert got == want


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(docs=_DOCS, budget=st.sampled_from([4, 8]), n_shards=st.sampled_from([1, 3]))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_pack_token_budget_matches_python_model(spark, docs, budget, n_shards):
    from cyrela_etl_spark.operators.corpus import pack_token_budget

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    got = {
        (r["doc_id"], r["shard"], r["n_tokens"], r["bin_id"])
        for r in pack_token_budget(df, budget=budget, n_shards=n_shards).collect()
    }
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, text in rows:
        by_shard.setdefault(_h60(str(i)) % n_shards, []).append((i, len(_toks(text))))
    want = set()
    for shard, members in by_shard.items():
        cum = 0
        for i, n_tok in sorted(members):  # id order within shard
            cum += n_tok
            want.add((i, shard, n_tok, math.floor((cum - n_tok) / budget)))
    assert got == want


@given(
    strata=st.lists(st.sampled_from(["en", "pt", "de"]), min_size=1, max_size=15),
    keep_pct=st.sampled_from([20, 50]),
)
@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_stratified_sample_matches_python_model(spark, strata, keep_pct):
    from cyrela_etl_spark.operators.corpus import stratified_sample

    rows = [(i, lang) for i, lang in enumerate(strata)]
    df = spark.createDataFrame(rows, "doc_id long, lang string").repartition(2)
    got = {
        (r["doc_id"], r["lang"], r["h_rank"])
        for r in stratified_sample(df, keep_pct=keep_pct).collect()
    }
    want = set()
    for lang in set(strata):
        members = sorted((i for i, l in rows if l == lang), key=lambda i: (_h60(str(i)), i))
        keep_n = math.ceil(len(members) * keep_pct / 100)
        want.update((i, lang, rank) for rank, i in enumerate(members[:keep_n], 1))
    assert got == want


@given(
    weights=st.lists(st.integers(1, 9), min_size=1, max_size=12),
    n=st.sampled_from([1, 3, 5]),
)
@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_weighted_priority_sample_matches_python_model(spark, weights, n):
    from cyrela_etl_spark.operators.corpus import weighted_priority_sample

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, weight long").repartition(2)
    got = sorted(
        (r["doc_id"], r["weight"], r["priority"], r["rank"])
        for r in weighted_priority_sample(df, "weight", n).collect()
    )
    # priority = hash(id) div weight: both positive, so SQL div == Python //
    pris = sorted(((_h60(str(i)) // w, i, w) for i, w in rows))[:n]
    want = sorted((i, w, p, rank) for rank, (p, i, w) in enumerate(pris, 1))
    assert got == want
