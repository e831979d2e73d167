"""Multimodal/Arrow scaling curves (VERDICT r14 item 5 — the last heavy
family without a measured curve).

Corpus: sf0.1 documents (5,000 ids) replicated to scale s with a
per-replica id offset of 2,560,000 — a multiple of every modulus
synthesize_media derives container parameters from (lcm of 4, 64*64,
8, 1000, 200*200, 320*320 = 2,560,000), so every replica synthesizes a
byte-identical payload MULTISET (only doc_id differs): kind counts,
total payload bytes and the whole meta-field distribution are EXACTLY
s-fold by construction, and the legs assert it. Assets are written to
/tmp parquet FIRST (the parquet-first protocol), then each timed leg
reads that table.

Legs per scale (JVM rchar / shuffle-REST deltas taken around each):

- build: synthesize_media (real BMP/WAV/JPEG/GIF containers, Arrow
  mapInPandas) -> parquet. Reported for context, not a curve claim.
- decode: extract_media_meta(strict=True) — full header parse of every
  payload. Wall must scale ~linearly; the JVM's /proc/<pid>/io rchar
  delta tracks the payload volume (the decode genuinely reads every
  byte). rchar is the witness because Spark's vectorized parquet reader
  does NOT route column-page reads through the Hadoop FileSystem
  statistics ("file" bytesRead sees only listings + footers — measured:
  3.4 KB for a 1.5 MB column read), while the kernel's rchar counts
  every read() the JVM issues.
- meta_only: groupBy(media_type).count() over the SAME table — the
  README claim "metadata-only queries never deserialize payloads":
  asserts `payload` absent from the executed ReadSchema AND the rchar
  delta < 10% of the decode leg's (footers + the string column only).
- histogram: byte_histogram (numpy bincount per Arrow batch); asserts
  sum(n) == total payload bytes EXACTLY (s-fold).
- dedup: the multimodal_duplicate_assets shape (md5 + length hash-agg);
  asserts sum(n_copies) == 5000*s and group count FLAT in s (replicas
  are exact copies), and — via the UI REST stage totals — that shuffle
  bytes track DIGEST rows, not payloads (< 5% of payload volume at
  s >= 10).

Usage: python tools/scale_curve_multimodal.py [scales...]  (default 1 10 100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402

OFFSET = 2_560_000  # lcm of every id-derived synth modulus (module doc)
BASE_DOCS = 5_000


def jvm_rchar(spark) -> int:
    """Bytes the Spark JVM has read() so far (/proc/<pid>/io rchar) —
    the payload-deserialization witness (module doc)."""
    pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())
    with open(f"/proc/{pid}/io") as fh:
        return int(next(line for line in fh if line.startswith("rchar")).split()[1])


def shuffle_write_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return sum(s.get("shuffleWriteBytes", 0) for s in json.load(r))


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 100]
    from cyrela_etl_spark.operators.multimodal import (
        byte_histogram,
        extract_media_meta,
        synthesize_media,
    )

    spark = get_spark(
        app_name="scale-curve-multimodal", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n_base = docs.count()
    assert n_base == BASE_DOCS, n_base

    base = {}  # s=smallest-scale reference values for the s-fold asserts
    for s in scales:
        root = f"/tmp/scale_mm_{s}"
        shutil.rmtree(root, ignore_errors=True)

        ids = (
            docs.crossJoin(F.broadcast(spark.range(s).select(F.col("id").alias("rep"))))
            .select((F.col("doc_id") + F.col("rep") * OFFSET).alias("doc_id"))
        )
        t0 = time.perf_counter()
        synthesize_media(ids).write.parquet(f"{root}/assets")
        build_wall = time.perf_counter() - t0
        assets = spark.read.parquet(f"{root}/assets")
        file_bytes = sum(
            f.stat().st_size for f in os.scandir(f"{root}/assets") if f.is_file()
        )
        print(
            f"RESULT scale={s} leg=build wall={build_wall:.1f}s "
            f"rows={BASE_DOCS * s} parquet_bytes={file_bytes}",
            flush=True,
        )

        # -- decode: full container parse of every payload ------------------
        b0 = jvm_rchar(spark)
        t0 = time.perf_counter()
        meta = extract_media_meta(assets, strict=True)
        agg = meta.groupBy("media_kind").agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_bytes").alias("bytes")
        ).collect()
        decode_wall = time.perf_counter() - t0
        decode_read = jvm_rchar(spark) - b0
        kinds = {r["media_kind"]: (r["n"], r["bytes"]) for r in agg}
        payload_bytes = sum(b for _n, b in kinds.values())
        n_rows = sum(n for n, _b in kinds.values())
        assert n_rows == BASE_DOCS * s, (n_rows, s)
        if not base:
            base.update(kinds=kinds, scale=s, payload=payload_bytes)
        else:
            f = s // base["scale"]
            assert payload_bytes == base["payload"] * f, "payload bytes not s-fold"
            for k, (n, b) in kinds.items():
                bn, bb = base["kinds"][k]
                assert (n, b) == (bn * f, bb * f), f"kind {k} not s-fold"
        print(
            f"RESULT scale={s} leg=decode wall={decode_wall:.2f}s "
            f"payload_bytes={payload_bytes} rchar={decode_read} "
            f"kinds={sorted((k, n) for k, (n, _b) in kinds.items())}",
            flush=True,
        )

        # -- meta_only: payload column must never be deserialized -----------
        b0 = jvm_rchar(spark)
        t0 = time.perf_counter()
        mo = assets.groupBy("media_type").agg(F.count(F.lit(1)).alias("n"))
        mo_rows = mo.collect()
        meta_wall = time.perf_counter() - t0
        meta_read = jvm_rchar(spark) - b0
        plan = mo._jdf.queryExecution().executedPlan().toString()
        assert "payload" not in plan.split("ReadSchema:")[-1], plan
        assert meta_read < max(0.10 * decode_read, 2_000_000), (
            f"metadata-only scan read {meta_read} B vs decode {decode_read} B"
        )
        assert sum(r["n"] for r in mo_rows) == BASE_DOCS * s
        print(
            f"RESULT scale={s} leg=meta_only wall={meta_wall:.2f}s "
            f"rchar={meta_read} read_pct_of_decode="
            f"{100.0 * meta_read / max(decode_read, 1):.1f}%",
            flush=True,
        )

        # -- histogram: sum of bin counts == total payload bytes ------------
        t0 = time.perf_counter()
        hist_sum = byte_histogram(assets).agg(F.sum("n")).collect()[0][0]
        hist_wall = time.perf_counter() - t0
        assert hist_sum == payload_bytes, (hist_sum, payload_bytes)
        print(
            f"RESULT scale={s} leg=histogram wall={hist_wall:.2f}s "
            f"sum_n={hist_sum}",
            flush=True,
        )

        # -- dedup: digests shuffle, payloads don't --------------------------
        sh0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        dd = (
            assets.select(
                "doc_id",
                F.md5("payload").alias("content_md5"),
                F.length("payload").cast("long").alias("n_bytes"),
            )
            .groupBy("content_md5", "n_bytes")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_copies"),
                F.min("doc_id").cast("long").alias("canonical_id"),
            )
        )
        dstat = dd.agg(
            F.count(F.lit(1)).alias("groups"), F.sum("n_copies").alias("copies")
        ).collect()[0]
        dedup_wall = time.perf_counter() - t0
        sh_delta = shuffle_write_bytes(spark) - sh0
        assert dstat["copies"] == BASE_DOCS * s
        if "groups" in base:
            assert dstat["groups"] == base["groups"], "replicas must be exact copies"
        else:
            base["groups"] = dstat["groups"]
        if s >= 10:
            assert sh_delta < 0.05 * payload_bytes, (
                f"dedup shuffled {sh_delta} B vs payloads {payload_bytes} B"
            )
        print(
            f"RESULT scale={s} leg=dedup wall={dedup_wall:.2f}s "
            f"groups={dstat['groups']} copies={dstat['copies']} "
            f"shuffle_write={sh_delta} "
            f"shuffle_pct_of_payload={100.0 * sh_delta / payload_bytes:.2f}%",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
