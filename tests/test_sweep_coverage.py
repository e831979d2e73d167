"""Pin the shared-construction sweep's evergreen coverage bookkeeping
(VERDICT r16 item 4): at HEAD every flagged oracle must be covered —
literal model mention, explicit operator-level mapping, or recorded
signal-false-positive — and the mapping itself must validate against
the registry and the model files, so registry/model drift fails CI
instead of silently corrupting the wave-queue the sweep exists to
produce."""

from __future__ import annotations

import os
import sys

import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(_TOOLS))

import shared_construction_sweep as scs  # noqa: E402


@pytest.fixture(scope="module")
def registry():
    from cyrela_etl_spark.queries import load_all

    return load_all()


def test_sweep_runs_clean_at_head(registry):
    rows, issues = scs.sweep(registry)
    assert issues == []
    uncovered = [r["name"] for r in rows if r["coverage"] == "UNCOVERED"]
    assert uncovered == []
    # the sweep found real work: the flagged set is stable-order, nonempty
    assert len(rows) >= 100


def test_mapping_keys_are_registry_entries(registry):
    for key in list(scs.OPERATOR_COVERAGE) + list(scs.SIGNAL_FALSE_POSITIVES):
        assert key in registry, key
    # disjoint by construction: an entry is either modeled or a false
    # positive, never both
    assert not set(scs.OPERATOR_COVERAGE) & set(scs.SIGNAL_FALSE_POSITIVES)


def test_mapped_model_files_exist():
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    for key, (csv, rationale) in scs.OPERATOR_COVERAGE.items():
        assert rationale.strip(), key
        for f in (x.strip() for x in csv.split(",")):
            assert os.path.exists(os.path.join(tests_dir, f)), (key, f)


def test_literal_match_is_word_boundary_exact():
    """ADVICE r16: plain substring matching marked dedup_exact covered
    because a model file mentioned dedup_exact_pairs."""
    assert not scs._literal("dedup_exact", "covers dedup_exact_pairs only")
    assert not scs._literal("stream_dedup", "stream_dedup_expiry drain")
    assert not scs._literal("text_quality", "x = text_quality_score(y)")
    assert scs._literal("dedup_exact", "model for dedup_exact on docs")
    assert scs._literal("dedup_exact", "dedup_exact(spark, sf)")
    assert scs._literal("dedup_exact", "name == 'dedup_exact'")


def test_validation_catches_drift(registry):
    """The self-checks bite: a fabricated mapping key not in the
    registry, and a key pointing at a missing model file, both report."""
    saved = dict(scs.OPERATOR_COVERAGE)
    try:
        scs.OPERATOR_COVERAGE["no_such_query_xyz"] = ("test_hash_model.py", "x")
        scs.OPERATOR_COVERAGE["dedup_simhash"] = ("test_gone_model.py", "x")
        _rows, issues = scs.sweep(registry)
        assert any("no_such_query_xyz" in i and "drift" in i for i in issues)
        assert any("test_gone_model.py" in i for i in issues)
    finally:
        scs.OPERATOR_COVERAGE.clear()
        scs.OPERATOR_COVERAGE.update(saved)


def test_validation_catches_stale_mapping(registry):
    """A mapping for a name that HAS a literal model mention is stale."""
    saved = dict(scs.OPERATOR_COVERAGE)
    try:
        # agg_regression_slope gained a literal model in round 17; mapping
        # it again must flag stale
        scs.OPERATOR_COVERAGE["agg_regression_slope"] = ("test_profile_encode_model.py", "x")
        _rows, issues = scs.sweep(registry)
        assert any("agg_regression_slope" in i and "stale" in i for i in issues)
    finally:
        scs.OPERATOR_COVERAGE.clear()
        scs.OPERATOR_COVERAGE.update(saved)
