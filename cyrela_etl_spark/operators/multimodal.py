"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct. The Spark-side machinery — schema, Arrow batch shape, partitioning,
``mapInPandas`` signatures — is real and tested; the actual media DECODE is
stubbed (the decode libraries are not in this container) behind
``decode_stub``: a deterministic fake that derives "decoded" properties
from the bytes, or ``NotImplementedError`` in strict mode.

At scale: binary payloads dominate partition size, so ``maxPartitionBytes``
/ explicit repartition must target bytes not rows; metadata-only operations
never deserialize payloads (column pruning keeps the binary column out of
the scan entirely when unreferenced — verified in tests via the physical
plan's ReadSchema).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic fake media properties derived from payload bytes.
FAKE_DECODE = True

MEDIA_META_SCHEMA = "doc_id long, n_bytes long, content_hash string, width int, height int, n_frames int"


def binarize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a binary-payload table from a text column (the test stand-in
    for reading real media bytes): (doc_id, payload binary, media_type)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def extract_media_meta(binary_df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode / feature-extract media payloads via Arrow-batched
    ``mapInPandas``.

    Real work per batch: byte length + md5 content hash (true properties
    of the payload). Stubbed work: width/height/n_frames, which a real
    implementation would get from an image/av decoder — here derived
    deterministically from the payload hash so tests are stable. With
    ``strict=True`` the stub raises NotImplementedError instead (the
    behavior a production build replaces).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not FAKE_DECODE or strict:
                raise NotImplementedError(
                    "media decode requires an image/audio decoder; not available in this environment"
                )
            payloads = pdf["payload"]
            hashes = [hashlib.md5(p).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_hash": hashes,
                    # Deterministic fake decode: dimensions from hash bytes.
                    "width": [16 + int(h[:2], 16) for h in hashes],
                    "height": [16 + int(h[2:4], 16) for h in hashes],
                    "n_frames": [1 for _ in hashes],
                }
            )

    return binary_df.mapInPandas(extract, schema=MEDIA_META_SCHEMA)


def byte_histogram(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL feature extraction over opaque payloads (no codec needed): the
    16-bin high-nibble byte histogram — the classic cheap content-type /
    entropy signal (text, compressed and media bytes have very different
    nibble profiles). Arrow-batched numpy bincount per batch; output is one
    (doc_id, nibble, n) row per non-empty bin — long form so downstream
    aggregation/classification is relational.
    """
    import numpy as np

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nibbles, counts = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8) >> 4
                c = np.bincount(arr, minlength=16)
                nz = np.nonzero(c)[0]
                ids.extend([doc_id] * len(nz))
                nibbles.extend(nz.tolist())
                counts.extend(c[nz].tolist())
            yield pd.DataFrame({"doc_id": ids, "nibble": nibbles, "n": counts})

    return binary_df.mapInPandas(hist, schema="doc_id long, nibble int, n long")


def sample_frames(binary_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode each payload into (doc_id,
    frame_index, frame_bytes) keeping every ``every_n``-th frame. The
    "frames" are fixed-size byte slices (stub for a video demuxer); the
    partitioning/explode shape matches what a real decoder version needs.
    """
    frame_size = 64

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_index": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = max(1, len(payload) // frame_size)
                for i in range(0, n, every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_index"].append(i)
                    rows["frame_bytes"].append(bytes(payload[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(sample, schema="doc_id long, frame_index int, frame_bytes binary")
