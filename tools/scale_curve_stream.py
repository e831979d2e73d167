"""1x/10x/100x scaling curves for the STATEFUL streaming path — the one
heavy family whose scale story was argued from design, not measured:
watermark-expiring dedup (dropDuplicatesWithinWatermark) and
watermark-bounded tumbling aggregation, drained AvailableNow through
multiple micro-batches into a parquet sink (the scale-true sink;
streaming/ops.py:run_available_now_to_parquet's rationale).

Protocol (the scale_curve_lsh replication discipline, adapted to
streams): the sf0.1 events table (100k events / 100k distinct event_ids
/ 1,500 users / 30 days) is replicated with DISJOINT id spaces (event_id
offset rep*10^9, user_id offset rep*10^6) and IDENTICAL timestamps, so
watermark semantics are unchanged while per-batch state rows must scale
exactly s-fold. The scaled input is written as N_SLICES time-ordered
parquet files with staged mtimes (the stream_dedup_expiry arrival
pattern, queries/streamingq.py:423) and streamed with
maxFilesPerTrigger=1 — one micro-batch per time slice, so the watermark
advances between batches and EXPIRES state: peak state measures the
in-watermark key population, not the corpus. A dedup leg ingests a 20%
duplicate stream (event_id%5==0 resent +50s — inside the 1h watermark,
so every resend must be dropped); its output row count must equal the
distinct event count EXACTLY (s-fold — the correctness checksum). The
agg leg counts per (1h window, user_id, event_type) with a 1h
watermark; closed windows flush to parquet, open ones stay unemitted by
append-mode contract.

Reported per leg: wall, input/output rows, micro-batches, and peak/final
state rows from the query's recentProgress (stateOperators) — state must
scale s-fold and stay far below input size (the eviction proof), wall
near-linear.

Usage: python tools/scale_curve_stream.py [scales...]   (default: 1 10 100)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N_SLICES = 10
COLS = ["event_id", "user_id", "event_type", "value", "ts"]


def build(spark, scale: int) -> str:
    """Scaled, time-sliced arrival directory: N_SLICES parquet files in
    ts order with staged mtimes (file-source batch order follows file
    modification time)."""
    from cyrela_etl_spark.sources.parquet import read_events

    path = f"/tmp/scale_stream_{scale}x"
    if os.path.exists(f"{path}/.built"):
        return path
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    ev = read_events(spark, SF_DIR).select(*COLS)
    reps = F.broadcast(spark.range(scale).select(F.col("id").alias("rep")))
    scaled = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * 1_000_000_000).alias("event_id"),
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "ts",
    )
    # 20% duplicates resent +50s (inside the 1h watermark): the dedup leg
    # must drop every one of them.
    dups = scaled.filter(F.col("event_id") % 5 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 50 SECONDS")
    )
    full = scaled.unionByName(dups.select(*COLS))
    bounds = full.agg(
        F.min(F.unix_timestamp("ts")).alias("lo"), F.max(F.unix_timestamp("ts")).alias("hi")
    ).collect()[0]
    width = (bounds["hi"] - bounds["lo"]) // N_SLICES + 1
    sliced = full.withColumn(
        "slice", ((F.unix_timestamp("ts") - F.lit(bounds["lo"])) / width).cast("int")
    )
    for i in range(N_SLICES):
        tmp = f"{path}/__s{i}"
        sliced.filter(F.col("slice") == i).select(*COLS).coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = f"{path}/arrival_{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))
    open(f"{path}/.built", "w").close()
    return path


def drain(spark, sdf, out_path: str):
    """AvailableNow drain into a parquet sink, returning (rows_out,
    n_batches, peak_state_rows, final_state_rows) from recentProgress."""
    checkpoint = tempfile.mkdtemp(prefix="ckpt_curve_")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_path)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progress = list(q.recentProgress)
    finally:
        spark.streams.resetTerminated()
        shutil.rmtree(checkpoint, ignore_errors=True)
    states = [
        sum(op["numRowsTotal"] for op in p["stateOperators"])
        for p in progress
        if p.get("stateOperators")
    ]
    n_out = spark.read.parquet(out_path).count()
    return n_out, len(progress), max(states or [0]), (states or [0])[-1]


def main() -> None:
    from cyrela_etl_spark.streaming.ops import (
        dedup_within_watermark,
        read_file_stream,
        tumbling_counts,
    )

    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="scale-curve-stream")
    spark.sparkContext.setLogLevel("ERROR")
    for scale in scales:
        path = build(spark, scale)
        schema = spark.read.parquet(f"{path}/arrival_0.parquet").schema
        n_in = spark.read.parquet(f"{path}/arrival_*.parquet").count()

        legs = [
            (
                "dedup_watermark",
                lambda s: dedup_within_watermark(s, ["event_id"], "ts", "1 hour"),
            ),
            (
                "tumbling_agg",
                lambda s: tumbling_counts(
                    s, "ts", "1 hour", keys=("user_id", "event_type"), watermark="1 hour"
                ),
            ),
        ]
        for name, fn in legs:
            out = tempfile.mkdtemp(prefix=f"sink_{name}_")
            shutil.rmtree(out)
            stream = read_file_stream(spark, path, schema, max_files_per_trigger=1)
            t0 = time.perf_counter()
            n_out, n_batches, peak_state, final_state = drain(spark, fn(stream), out)
            dt = time.perf_counter() - t0
            print(
                f"RESULT scale={scale}x rows_in={n_in} op={name} wall={dt:.1f}s "
                f"batches={n_batches} rows_out={n_out} "
                f"peak_state={peak_state} final_state={final_state}",
                flush=True,
            )
            shutil.rmtree(out, ignore_errors=True)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
