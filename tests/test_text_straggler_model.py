"""Model checks for the remaining text-surface queries (text_token_counts,
text_term_stats, text_positional_index, text_phrase_search,
text_readability) — model-check wave 3. Python regex/Counter models:
the BPE-ish boundary-split token estimate (lookaround regex replayed by
Python re), per-doc top-terms with (tf desc, term asc) ties, the
positional postings with comma-serialized sorted positions, adjacency
phrase hits, and the Flesch chain in the engine's operation order.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_TOP_TERMS = 5
_TERMS = ["data", "table", "join", "stream"]
_PHRASE = ("data", "stream")


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]


def test_token_counts_match_python_regex(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_token_counts

    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in text_token_counts(spark, sf_dir).collect()
    }
    bpe = re.compile(r"\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|(?=[^a-z0-9\s])")
    want = {}
    for r in _docs(sf_dir).itertuples(index=False):
        pieces = [p for p in bpe.split(r.text.lower()) if p]
        want[int(r.doc_id)] = (len(_toks(r.text)), len(pieces))
    assert got == want


def test_term_stats_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_term_stats

    got = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tf"], r["df"])
        for r in text_term_stats(spark, sf_dir).collect()
    }
    tf: dict[int, Counter] = {}
    for r in _docs(sf_dir).itertuples(index=False):
        toks = _toks(r.text)
        if toks:
            tf[int(r.doc_id)] = Counter(toks)
    df: Counter = Counter()
    for counts in tf.values():
        df.update(counts.keys())
    want = {}
    for doc_id, counts in tf.items():
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP_TERMS]
        for rnk, (term, f) in enumerate(ranked):
            want[(doc_id, rnk + 1)] = (term, f, df[term])
    assert got == want


def test_positional_index_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_positional_index

    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["positions"])
        for r in text_positional_index(spark, sf_dir).collect()
    }
    want = {}
    postings: dict[tuple[str, int], list[int]] = defaultdict(list)
    for r in _docs(sf_dir).itertuples(index=False):
        for pos, t in enumerate(_toks(r.text)):
            if t in _TERMS:
                postings[(t, int(r.doc_id))].append(pos)
    want = {
        key: (len(ps), ",".join(str(p) for p in sorted(ps)))
        for key, ps in postings.items()
    }
    assert got == want


def test_phrase_search_matches_python_scan(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_phrase_search

    got = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in text_phrase_search(spark, sf_dir).collect()
    }
    w1, w2 = _PHRASE
    want = {}
    for r in _docs(sf_dir).itertuples(index=False):
        toks = _toks(r.text)
        hits = [i for i in range(len(toks) - 1) if toks[i] == w1 and toks[i + 1] == w2]
        if hits:
            want[int(r.doc_id)] = (len(hits), hits[0])
    assert got == want


def test_readability_matches_python_chain(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_readability

    got = {
        r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"], r["flesch_score"])
        for r in text_readability(spark, sf_dir).collect()
    }
    want = {}
    for r in _docs(sf_dir).itertuples(index=False):
        words = len(_toks(r.text))
        if words == 0:
            continue
        sentences = max(len(re.findall(r"[.!?]+", r.text)), 1)
        syllables = len(re.findall(r"[aeiouy]+", r.text.lower()))
        fre = 206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)
        want[int(r.doc_id)] = (words, sentences, syllables, _round6(fre))
    assert got == want
