"""Independent-parser validation of the synthesized MP3 streams
(operators/multimodal.py synthesize_mp3) — the audio sibling of
test_media_container_validity. The walker below is written from the
public MPEG-1 Audio Layer III header layout (11-bit sync, version/layer
bits, the spec's bitrate and sample-rate index tables, frame length
144*bitrate/sample_rate + padding) and the ID3v2.3 syncsafe-length tag
format — constants spelled here from the spec, NOT imported from the
operator, so a table or layout bug on the build side cannot hide.
"""

from __future__ import annotations

import pytest

# Public MPEG-1 Layer III tables (ISO/IEC 11172-3): sample-rate index ->
# Hz, bitrate index -> kbps (index 0 is "free", 15 invalid).
_SR = {0: 44100, 1: 48000, 2: 32000}
_BR = {1: 32, 2: 40, 3: 48, 4: 56, 5: 64, 6: 80, 7: 96, 8: 112,
       9: 128, 10: 160, 11: 192, 12: 224, 13: 256, 14: 320}


def _walk(b: bytes):
    pos = 0
    if b[:3] == b"ID3":
        assert b[3] == 3 and b[4] == 0  # ID3v2.3
        tag_len = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        pos = 10 + tag_len
    frames = []
    while pos + 4 <= len(b):
        assert b[pos] == 0xFF and (b[pos + 1] & 0xE0) == 0xE0, "lost sync"
        assert (b[pos + 1] >> 3) & 0x3 == 0x3, "not MPEG-1"
        assert (b[pos + 1] >> 1) & 0x3 == 0x1, "not Layer III"
        br_idx = b[pos + 2] >> 4
        sr_idx = (b[pos + 2] >> 2) & 0x3
        padding = (b[pos + 2] >> 1) & 0x1
        assert br_idx in _BR and sr_idx in _SR
        frame_len = 144 * _BR[br_idx] * 1000 // _SR[sr_idx] + padding
        frames.append((_SR[sr_idx], _BR[br_idx]))
        pos += frame_len
    assert pos == len(b), "trailing bytes after the last frame"
    return frames


@pytest.fixture(scope="module")
def mp3s(spark, sf_dir):
    from cyrela_etl_spark.operators.multimodal import synthesize_mp3

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    rows = synthesize_mp3(docs).collect()
    return {int(r["doc_id"]): bytes(r["payload"]) for r in rows}


def test_mp3_streams_walk_with_spec_tables(mp3s):
    assert mp3s
    for doc_id, payload in mp3s.items():
        frames = _walk(payload)
        assert len(frames) == 1 + doc_id % 8
        want_sr = _SR[doc_id % 3]
        want_br = _BR[1 + doc_id % 14]
        assert all(f == (want_sr, want_br) for f in frames)
