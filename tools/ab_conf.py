"""Interleaved A/B of a session conf around a registry query (e.g. AQE
on/off for the iterative connected-components queries, VERDICT r17 item 4:
the loop is driver-latency-bound — 32 tiny jobs, half the wall in
inter-job gaps — and per-stage AQE re-planning is a prime suspect).

Protocol: ONE session, legs alternated rep-by-rep; the conf is set before
the timed call and restored after (the query plans eagerly inside, so the
set-and-restore brackets its whole execution). Timed action = bench.py's
exact action; checksums asserted identical across legs.

Usage: python tools/ab_conf.py <query> --conf spark.sql.adaptive.enabled \
           --values true,false [--reps N]
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
    conf_key = sys.argv[sys.argv.index("--conf") + 1]
    values = sys.argv[sys.argv.index("--values") + 1].split(",")
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cyrela_etl_spark.queries import load_all

    registry = load_all()
    spark = get_spark(app_name="ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    fn, _ = registry[name]
    old = spark.conf.get(conf_key)

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

    timed()  # warmup

    samples: dict[str, list[float]] = {v: [] for v in values}
    sigs: set = set()
    try:
        for r in range(reps):
            for v in values:
                spark.conf.set(conf_key, v)
                dt, sig = timed()
                samples[v].append(dt)
                sigs.add(sig)
                print(f"{name} rep {r + 1}/{reps} {conf_key}={v}: {dt:.3f}s n={sig[0]}", file=sys.stderr)
    finally:
        spark.conf.set(conf_key, old)

    print(json.dumps({
        "query": name,
        "conf": conf_key,
        "checksums_identical": len(sigs) == 1,
        "medians": {v: round(statistics.median(s), 3) for v, s in samples.items()},
        "samples": {v: [round(x, 3) for x in s] for v, s in samples.items()},
    }, indent=1))


if __name__ == "__main__":
    main()
