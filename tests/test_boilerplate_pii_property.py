"""Hypothesis-randomized models for remove_boilerplate_lines and
redact_pii (operators/corpus.py) — the operator-level complement to the
fixed-corpus query models in test_rake_boilerplate_model /
test_curation_quality_model. Random inputs reach the edges the planted
corpus never does: one-document groups (where the min_docs_with_line=2
floor is the only thing keeping the whole document from vanishing),
boilerplate lines repeated WITHIN one document (every copy stripped,
line counted once toward DF), exactly-at-threshold ratios (strict >),
documents that become empty, and emails directly adjacent to
phone-shaped digit runs (sequential redaction order matters).
"""

from __future__ import annotations
import pytest

import re
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_LINES = ["cookie banner", "nav menu", "real content a", "real content b", "x"]
_DOC = st.lists(st.sampled_from(_LINES), min_size=1, max_size=6)
_GROUPED = st.lists(
    st.tuples(st.sampled_from(["s1", "s2"]), _DOC), min_size=1, max_size=8
)

_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(docs=_GROUPED)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_remove_boilerplate_matches_python_model(spark, docs):
    from cyrela_etl_spark.operators.corpus import remove_boilerplate_lines

    rows = [(i, grp, "\n".join(lines)) for i, (grp, lines) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string").repartition(2)
    got = {
        r["doc_id"]: (r["source"], r["text_clean"], r["n_lines"], r["n_lines_removed"])
        for r in remove_boilerplate_lines(df).collect()
    }
    group_docs: dict[str, int] = defaultdict(int)
    line_docs: dict[tuple[str, str], set[int]] = defaultdict(set)
    for doc_id, grp, text in rows:
        group_docs[grp] += 1
        for line in text.split("\n"):
            line_docs[(grp, line)].add(doc_id)
    boiler = {
        key
        for key, ds in line_docs.items()
        if len(ds) >= 2 and len(ds) / group_docs[key[0]] > 0.3
    }
    want = {}
    for doc_id, grp, text in rows:
        lines = text.split("\n")
        kept = [ln for ln in lines if (grp, ln) not in boiler]
        want[doc_id] = (grp, "\n".join(kept), len(lines), len(lines) - len(kept))
    assert got == want


_PII_FRAGMENTS = [
    "hello world",
    "a.b-c@mail.example.org",
    "+1 (555) 010-0199",
    "55501001234",
    "x@y.zz",
    "not@an",  # no TLD: must NOT redact
    "12-34",  # too short for the phone shape
    "end9",
]
_PII_DOC = st.lists(st.sampled_from(_PII_FRAGMENTS), min_size=0, max_size=5)


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(docs=st.lists(_PII_DOC, min_size=1, max_size=6))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_redact_pii_matches_python_re(spark, docs):
    from cyrela_etl_spark.operators.corpus import redact_pii

    rows = [(i, " ".join(frags)) for i, frags in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["redacted_text"])
        for r in redact_pii(df).collect()
    }
    want = {}
    for doc_id, text in rows:
        n_email = len(re.findall(_EMAIL, text))
        after = re.sub(_EMAIL, "[PII]", text)
        n_phone = len(re.findall(_PHONE, after))
        want[doc_id] = (n_email, n_phone, re.sub(_PHONE, "[PII]", after))
    assert got == want
