"""Hypothesis property models for the opaque-binary plumbing operators
(operators/multimodal.py byte_histogram, sample_frames) on ADVERSARIAL
payloads the UTF-8-text query path never produces: empty payloads,
single bytes, 0x00/0xFF runs, non-UTF8 byte soup, and lengths straddling
the 64-byte frame boundary. Pins the Arrow binary round-trip (payload
bytes survive Spark binary columns bit-exactly) and the exact slice /
bincount arithmetic including the empty-payload single-frame floor.
"""

from __future__ import annotations
import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PAYLOAD = st.one_of(
    st.binary(min_size=0, max_size=20),
    st.binary(min_size=60, max_size=70),   # straddles one frame boundary
    st.binary(min_size=120, max_size=200), # several frames
    st.just(b""),
    st.just(b"\x00" * 64),
    st.just(b"\xff" * 65),
)
_ROWS = st.lists(_PAYLOAD, min_size=1, max_size=8)


def _df(spark, payloads):
    return spark.createDataFrame(
        [(i, p, "application/octet-stream") for i, p in enumerate(payloads)],
        "doc_id long, payload binary, media_type string",
    ).repartition(2)


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(payloads=_ROWS)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_byte_histogram_matches_python_model(spark, payloads):
    from cyrela_etl_spark.operators.multimodal import byte_histogram

    got = {
        (r["doc_id"], r["nibble"]): r["n"]
        for r in byte_histogram(_df(spark, payloads)).collect()
    }
    want = {}
    for i, p in enumerate(payloads):
        for nib, n in Counter(b >> 4 for b in p).items():
            want[(i, nib)] = n
    assert got == want


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
@given(payloads=_ROWS, every_n=st.sampled_from([1, 2, 3]))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_sample_frames_matches_python_model(spark, payloads, every_n):
    from cyrela_etl_spark.operators.multimodal import sample_frames

    got = {
        (r["doc_id"], r["frame_index"]): bytes(r["frame_bytes"])
        for r in sample_frames(_df(spark, payloads), every_n=every_n).collect()
    }
    want = {}
    for i, p in enumerate(payloads):
        n = max(1, len(p) // 64)
        for idx in range(0, n, every_n):
            want[(i, idx)] = p[idx * 64 : (idx + 1) * 64]
    assert got == want
