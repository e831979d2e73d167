"""Model check for the Bloom-filter join prefilter (operators/bloom.py)
vs a plain-Python reference (the round-9/10 model-test pattern). The
whole pipeline is md5/modular/bit arithmetic — Kirsch–Mitzenmacher
double hashing over two DISJOINT md5 hex slices — so the exact bitmap,
candidate set, and false-positive count are modelable, not just the
final join result.

What this pins beyond the oracle twin:

- the two base hashes' hex-slice layout (h1 = hexdigest[0:15], h2 =
  hexdigest[15:30]) and position_i = (h1 + i·h2) mod m for i in 1..k;
- the (bucket = pos div 32, word = bit_or(1 << pos mod 32)) bitmap
  relation shape;
- probe semantics: a key is a candidate iff ALL k positions are set —
  asserted as exact candidate-set equality at a deliberately TINY m
  (m_bits=128) where hash collisions make false positives common;
- the structural guarantee false positives must never break: every
  probe key that IS in the build set is always a candidate
  (no-false-negatives), and n_false_positives = candidates − verified.
"""

from __future__ import annotations
import pytest

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_KEYS = st.lists(st.sampled_from([f"k{i}" for i in range(40)]), min_size=1, max_size=20)


def _h(s: str, start: int, length: int) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[start : start + length], 16)


def _positions(key: str, m_bits: int, k: int) -> list[int]:
    h1, h2 = _h(key, 0, 15), _h(key, 15, 15)
    return [(h1 + i * h2) % m_bits for i in range(1, k + 1)]


def _model_bitmap(keys: set[str], m_bits: int, k: int) -> dict[int, int]:
    words: dict[int, int] = {}
    for key in keys:
        for pos in _positions(key, m_bits, k):
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    return words


def _model_candidates(probe: set[str], words: dict[int, int], m_bits: int, k: int) -> set[str]:
    return {
        key
        for key in probe
        if all((words.get(pos // 32, 0) >> (pos % 32)) & 1 for pos in _positions(key, m_bits, k))
    }


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(build=_KEYS, probe=_KEYS, m_bits=st.sampled_from([128, 1024]))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_bloom_bitmap_probe_and_report_match_python_model(spark, build, probe, m_bits):
    from cyrela_etl_spark.operators.bloom import bloom_build, bloom_prefilter_report, bloom_probe

    k = 3
    bset, pset = set(build), set(probe)
    bdf = spark.createDataFrame([(x,) for x in bset], "key string").repartition(2)
    pdf = spark.createDataFrame([(x,) for x in pset], "key string").repartition(2)

    bitmap = bloom_build(bdf, "key", m_bits=m_bits, k=k)
    got_words = {r["bucket"]: r["word"] for r in bitmap.collect()}
    want_words = _model_bitmap(bset, m_bits, k)
    assert got_words == want_words

    got_cand = {r["key"] for r in bloom_probe(pdf, bitmap, "key", m_bits=m_bits, k=k).collect()}
    want_cand = _model_candidates(pset, want_words, m_bits, k)
    assert got_cand == want_cand
    # no false negatives, ever: true members always survive the filter
    assert pset & bset <= got_cand

    rep = bloom_prefilter_report(bdf, pdf, "key", m_bits=m_bits, k=k).collect()
    assert len(rep) == 1
    r = rep[0]
    assert (
        r["n_build_keys"],
        r["n_probe_keys"],
        r["n_candidates"],
        r["n_verified"],
        r["n_false_positives"],
    ) == (
        len(bset),
        len(pset),
        len(want_cand),
        len(want_cand & bset),
        len(want_cand - bset),
    )
    spark.catalog.clearCache()  # report persists its key sets (cache contract)
