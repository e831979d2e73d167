"""Independent-parser validation of the synthesized media containers
(operators/multimodal.py synthesize_media) — model-check wave 3.

The media-decode oracle predicts every decoded field arithmetically and
extract_media_meta re-parses the headers, but BOTH sides of that check
live in this repo. These tests hand the synthesized bytes to parsers the
repo does not own: the Python stdlib `wave` module for WAV, and direct
spec-offset `struct` reads for BMP (BITMAPFILEHEADER/BITMAPINFOHEADER),
GIF89a (logical screen descriptor), and JPEG (JFIF SOI/APP0 + SOF0 scan)
— so "every byte is a container an external header parser could open" is
asserted against the published layouts, not the engine's own parser.
"""

from __future__ import annotations

import io
import struct
import wave

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    from cyrela_etl_spark.operators.multimodal import synthesize_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    rows = synthesize_media(docs).collect()
    return {int(r["doc_id"]): (r["media_type"], bytes(r["payload"])) for r in rows}


def test_wav_payloads_parse_with_stdlib_wave(media):
    checked = 0
    for doc_id, (kind, payload) in media.items():
        if doc_id % 4 != 1:
            continue
        assert kind == "audio/wav"
        with wave.open(io.BytesIO(payload)) as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2  # 16-bit PCM
            assert w.getframerate() == 8000 + (doc_id % 8) * 1000
            assert w.getnframes() == 1 + doc_id % 1000
            assert len(w.readframes(w.getnframes())) == 2 * (1 + doc_id % 1000)
        checked += 1
    assert checked > 0


def test_bmp_payloads_match_spec_offsets(media):
    checked = 0
    for doc_id, (kind, payload) in media.items():
        if doc_id % 4 != 0:
            continue
        assert kind == "image/bmp"
        assert payload[:2] == b"BM"
        file_size, _, pixel_offset = struct.unpack_from("<III", payload, 2)
        assert file_size == len(payload)
        header_size, width, height = struct.unpack_from("<IiI", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        assert header_size == 40 and planes == 1 and bpp == 24
        assert width == 1 + doc_id % 64
        assert abs(height) == 1 + (doc_id // 64) % 64
        row = (width * 3 + 3) // 4 * 4  # 4-byte-aligned 24-bpp rows
        assert len(payload) == pixel_offset + row * abs(height)
        checked += 1
    assert checked > 0


def test_gif_payloads_match_spec_offsets(media):
    checked = 0
    for doc_id, (kind, payload) in media.items():
        if doc_id % 4 != 3:
            continue
        assert kind == "image/gif"
        assert payload[:6] == b"GIF89a"
        width, height = struct.unpack_from("<HH", payload, 6)
        assert width == 1 + doc_id % 320
        assert height == 1 + (doc_id // 320) % 320
        assert payload[-1:] == b"\x3b"  # GIF trailer
        checked += 1
    assert checked > 0


def test_jpeg_payloads_walk_as_jfif_segments(media):
    checked = 0
    for doc_id, (kind, payload) in media.items():
        if doc_id % 4 != 2:
            continue
        assert kind == "image/jpeg"
        assert payload[:2] == b"\xff\xd8"  # SOI
        assert payload[-2:] == b"\xff\xd9"  # EOI
        # independent marker walk per ITU T.81 Annex B: every segment
        # between SOI and SOS declares its own length
        pos, dims = 2, None
        while pos < len(payload) - 1:
            assert payload[pos] == 0xFF
            marker = payload[pos + 1]
            if marker == 0xDA:  # SOS: entropy data follows until EOI
                break
            assert pos + 4 <= len(payload), (
                f"truncated segment: marker 0x{marker:02x} at {pos} has no "
                f"length field (payload {len(payload)} bytes)"
            )
            (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
            if marker == 0xC0:  # SOF0: baseline dims
                assert pos + 9 <= len(payload), (
                    f"truncated SOF0 at {pos}: no room for the dim fields"
                )
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                dims = (w, h)
            pos += 2 + seg_len
        assert dims == (1 + doc_id % 200, 1 + (doc_id // 200) % 200)
        checked += 1
    assert checked > 0
