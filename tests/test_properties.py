"""Property-based tests (SURVEY.md §5.3): date reformatting, delinquency
bucketization boundaries, and null-guard behavior — hypothesis-generated
inputs checked against plain-Python reference semantics."""

from __future__ import annotations
import pytest

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cyrela_etl_spark.functions.dates import reformat_date
from cyrela_etl_spark.operators.wallet import wallet_features

_SETTINGS = dict(
    max_examples=12,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    dates=st.lists(
        st.one_of(
            st.dates(datetime.date(1950, 1, 1), datetime.date(2099, 12, 31)),
            st.none(),
        ),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
def test_reformat_date_roundtrip_and_null_guard(spark, dates):
    raw = [(d.strftime("%d/%m/%Y") if d else None,) for d in dates]
    df = spark.createDataFrame(raw, T.StructType().add("s", T.StringType(), True))
    out = [r["iso"] for r in df.select(reformat_date("s").alias("iso")).collect()]
    expect = [d.strftime("%Y-%m-%d") if d else None for d in dates]
    assert out == expect


@settings(**_SETTINGS)
@given(
    days=st.lists(st.integers(min_value=-1500, max_value=0), min_size=1, max_size=12)
)
@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
def test_bucketize_boundaries(spark, days):
    # Reference first-match CASE (spark/jobs/pr-wallet-data-tf.py:109-112):
    # >= -30 → 0, >= -90 → 1, else 2. Exercised through the REAL feature
    # query so predicate order is what's under test.
    rows = [
        (1, "Cyrela", i, 10, 1, d, "2020-01-15", "2020-02-15", "2020-06-01",
         100.0, 50.0, 25.0, 200.0)
        for i, d in enumerate(days)
    ]
    schema = (
        T.StructType()
        .add("empresa", T.IntegerType())
        .add("marca", T.StringType())
        .add("obra", T.IntegerType())
        .add("unidade", T.IntegerType())
        .add("bloco", T.IntegerType())
        .add("dias_atraso", T.IntegerType())
        .add("dt_venda", T.StringType())
        .add("dt_chaves", T.StringType())
        .add("data_base", T.StringType())
        .add("saldo_devedor", T.DoubleType())
        .add("valor_pago_atualizado", T.DoubleType())
        .add("valor_pago", T.DoubleType())
        .add("vgv", T.DoubleType())
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "carteira_sd_gerencial", F.col("obra")
    )
    out = wallet_features(df).select("obra", "p_dias_atraso_category").collect()
    got = {r["obra"]: r["p_dias_atraso_category"] for r in out}
    for i, d in enumerate(days):
        expect = 0 if d >= -30 else (1 if d >= -90 else 2)
        assert got[i] == expect, f"dias_atraso={d}"


WORD = st.text(alphabet="abcdefg", min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=1, max_size=40).map(" ".join)


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=1, max_size=5))
def test_chunks_reconstruct_token_stream(spark, docs):
    """Dropping each chunk's leading `overlap` tokens (except chunk 0) and
    concatenating must reproduce the document's token sequence exactly —
    no token lost or duplicated by the windowing."""
    from cyrela_etl_spark.operators.corpus import chunk_documents

    chunk, overlap = 8, 3
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=chunk, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, doc in enumerate(docs):
        want = doc.lower().split()
        rows = sorted(by_doc[i], key=lambda r: r["chunk_index"])
        got = []
        for j, r in enumerate(rows):
            toks = r["chunk_text"].split()
            got.extend(toks if j == 0 else toks[overlap:])
        assert got == want, (i, got, want)


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(DOC, min_size=2, max_size=5))
def test_minhash_signature_structure_and_exact_dup_equality(spark, docs):
    """Signatures have exactly K components in [0, P); byte-identical
    documents always produce identical signatures (MinHash is a function
    of the shingle set)."""
    from cyrela_etl_spark.functions.hashing import MERSENNE_PRIME
    from cyrela_etl_spark.operators.dedup import minhash_signatures

    # plant an exact duplicate of doc 0
    rows = list(enumerate(docs)) + [(len(docs), docs[0])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = {r["id"]: list(r["signature"]) for r in minhash_signatures(df, num_hashes=8).collect()}
    for sig in sigs.values():
        assert len(sig) == 8
        assert all(0 <= v < MERSENNE_PRIME for v in sig)
    assert sigs[0] == sigs[len(docs)]


def test_cents_half_away_matches_duckdb_round_bulk():
    """The engine's cent conversion must agree with SQL round() on 10k
    seeded random doubles including exact .5 products and negatives —
    the pandas half-even default diverges on hundreds of these."""
    import duckdb
    import numpy as np
    import pandas as pd

    from cyrela_etl_spark.operators.grouped import _cents_half_away

    rng = np.random.default_rng(42)
    vals = np.concatenate([
        rng.uniform(-100, 100, 9000).round(3),       # typical money values
        (rng.integers(-2000, 2000, 1000) + 0.5) / 100.0,  # exact .5 cents
    ])
    s = pd.Series(vals)
    engine = _cents_half_away(s).to_numpy()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    oracle = con.execute("SELECT CAST(round(v * 100) AS BIGINT) FROM t").df().iloc[:, 0].to_numpy()
    assert (engine == oracle).all()
