"""Model checks for the curation/quality gate queries (corpus_pii_redact,
quality_gopher_rules, corpus_epoch_plan, ml_leakage_check) — model-check
wave 3. Python re/Counter replays: sequential PII redaction (emails
counted on raw text, phones on the email-redacted text), the Gopher rule
set in exact-integer millis/cross-multiplication form with first-failure
triage, integer epoch-budget planning, and the hash-split shingle
leakage audit over the planted corpus.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
_STOP = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
         "that", "for", "on", "as", "with", "was", "at", "by"}
_BUDGET, _CAP = 1_000_000, 4
_LEAK_N, _TRAIN_PCT = 8, 80


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_pii_redact_matches_python_re(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import corpus_pii_redact

    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["redacted_md5"])
        for r in corpus_pii_redact(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    want = {}
    for r in docs.itertuples(index=False):
        d = int(r.doc_id)
        text = r.text
        if d % 5 == 0:
            text = f"{text} contact user{d}@example.com or +15550100{d % 100}"
        n_email = len(re.findall(_EMAIL, text))
        after_email = re.sub(_EMAIL, "[PII]", text)
        n_phone = len(re.findall(_PHONE, after_email))
        redacted = re.sub(_PHONE, "[PII]", after_email)
        want[d] = (n_email, n_phone, hashlib.md5(redacted.encode()).hexdigest())
    assert got == want


def test_gopher_rules_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import quality_gopher_rules

    got = {
        r["doc_id"]: (r["n_words"], r["mean_word_len_milli"], r["n_alpha_words"],
                      r["n_stopword_hits"], r["keep"], r["first_failed_rule"])
        for r in quality_gopher_rules(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    want = {}
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        if not toks:
            continue
        n = len(toks)
        mwl = (1000 * sum(len(t) for t in toks)) // n
        n_alpha = sum(1 for t in toks if re.search("[a-z]", t))
        n_stop = sum(1 for t in toks if t in _STOP)
        oks = [
            ("min_words", n >= 50),
            ("max_words", n <= 100000),
            ("word_len", 3000 <= mwl <= 10000),
            ("alpha_frac", n_alpha * 10 >= n * 8),
            ("stopwords", n_stop >= 2),
        ]
        keep = all(ok for _, ok in oks)
        first_fail = next((name for name, ok in oks if not ok), None)
        want[int(r.doc_id)] = (n, mwl, n_alpha, n_stop, keep, first_fail)
    assert got == want


def test_epoch_plan_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import corpus_epoch_plan

    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["budget_tokens"],
                      r["epochs"], r["planned_tokens"])
        for r in corpus_epoch_plan(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["source", "text"]]
    per: dict[str, list[int]] = defaultdict(list)
    for r in docs.itertuples(index=False):
        per[r.source].append(len(_toks(r.text)))
    n_src = len(per)
    budget = int(math.floor(_BUDGET / n_src))
    want = {
        src: (
            len(toks), sum(toks), budget,
            min(_round6(budget / sum(toks)), float(_CAP)),
            min(budget, _CAP * sum(toks)),
        )
        for src, toks in per.items()
    }
    assert got == want


def test_leakage_check_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import ml_leakage_check

    row = ml_leakage_check(spark, sf_dir).collect()[0]
    got = (row["n_test_docs"], row["n_leaked"], row["leak_ratio"])

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    base = [(int(d), t) for d, t in docs.itertuples(index=False)]
    rows = (
        base
        + [(d + 100000, t) for d, t in base if d % 10 == 0]
        + [(d + 200000, t + " zyx extra") for d, t in base if d % 7 == 0]
    )
    train_sh: set[str] = set()
    test_docs: list[tuple[int, set[str]]] = []
    n_test = 0
    for doc_id, text in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        is_train = h % 100 < _TRAIN_PCT
        toks = _toks(text)
        sh = {
            " ".join(toks[i : i + _LEAK_N])
            for i in range(len(toks) - _LEAK_N + 1)
        } if len(toks) >= _LEAK_N else set()
        if is_train:
            train_sh |= sh
        else:
            n_test += 1
            test_docs.append((doc_id, sh))
    n_leaked = sum(1 for _, sh in test_docs if sh & train_sh)
    assert got == (n_test, n_leaked, n_leaked / n_test)
