"""Interleaved A/B of the streaming drain's state-partition width for one
streaming registry query (VERDICT r17 item 3: stream_dedup_expiry
inherited drain width 4 without its own A/B and the driver read 2.5x
slower — measure widths 4/8/16 and give the query its own width if the
default harms it).

Protocol: ONE session, widths alternated rep-by-rep via
SPARK_GRAFT_STREAM_DRAIN_PARTITIONS (read at call time by
queries/streamingq._drain). Timed action = bench.py's exact action;
result equivalence asserted per rep across widths (state-partition count
must not change the drained relation).

Usage: python tools/ab_drain_width.py <query> [--widths 4,8,16] [--reps N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    widths = [4, 8, 16]
    reps = 5
    for i, a in enumerate(sys.argv):
        if a == "--widths":
            widths = [int(w) for w in sys.argv[i + 1].split(",")]
        if a == "--reps":
            reps = int(sys.argv[i + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cyrela_etl_spark.queries import load_all

    registry = load_all()

    spark = get_spark(app_name="ab-drain-width")
    spark.sparkContext.setLogLevel("ERROR")
    fn, _ = registry[name]

    def timed():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("checksum"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt, (row["n"], row["checksum"])

    # warmup (fixture build, codegen) at the shipped default
    timed()

    samples: dict[int, list[float]] = {w: [] for w in widths}
    sigs: set = set()
    for r in range(reps):
        for w in widths:
            os.environ["SPARK_GRAFT_STREAM_DRAIN_PARTITIONS"] = str(w)
            dt, sig = timed()
            samples[w].append(dt)
            sigs.add(sig)
            print(f"{name} rep {r + 1}/{reps} width={w}: {dt:.3f}s n={sig[0]}", file=sys.stderr)
    os.environ.pop("SPARK_GRAFT_STREAM_DRAIN_PARTITIONS", None)

    print(json.dumps({
        "query": name,
        "checksums_identical": len(sigs) == 1,
        "medians": {str(w): round(statistics.median(s), 3) for w, s in samples.items()},
        "samples": {str(w): [round(x, 3) for x in s] for w, s in samples.items()},
    }, indent=1))


if __name__ == "__main__":
    main()
