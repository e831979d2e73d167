"""Property-based invariants (hypothesis) for the text/dedup operators —
random corpora, structural guarantees that must hold for ANY input, not
just the fixture tables. Example counts are small because each example is
a Spark job; the properties are exact, not statistical."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=1, max_size=40).map(" ".join)


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
