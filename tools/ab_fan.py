"""Interleaved A/B of the fan_out post-read repartition for specific
registry queries (VERDICT r17 item 2: six fanned rows shipped without a
paired A/B and the driver measured all six slower under contaminated
weather — settle each with the repo's same-session interleaved protocol).

Protocol (the host-weather discipline): ONE session, legs alternated
rep-by-rep —
  A = shipped code (fan_out active),
  B = fan_out monkeypatched to identity in every query module that
      imported it (textq, round8q, vectorq, sources.parquet).
Timed action = bench.py's exact action (count + per-row xxhash64 fold over
every output column, collected to one driver row), clearCache between
reps. Result equivalence is asserted per rep: row count and checksum must
be identical across legs.

Usage: python tools/ab_fan.py <query> [query ...] [--reps N]
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
    argv = sys.argv[1:]
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    if not args:
        print("usage: ab_fan.py <query> [query ...] [--reps N]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cyrela_etl_spark.queries import load_all

    registry = load_all()
    import cyrela_etl_spark.queries.round8q as round8q
    import cyrela_etl_spark.queries.textq as textq
    import cyrela_etl_spark.queries.vectorq as vectorq
    import cyrela_etl_spark.sources.parquet as pq_src

    modules = [textq, round8q, vectorq, pq_src]
    real_fan = pq_src.fan_out

    def set_fan(active: bool) -> None:
        fn = real_fan if active else (lambda df: df)
        for m in modules:
            m.fan_out = fn

    spark = get_spark(app_name="ab-fan")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: str):
        fn, _ = registry[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("checksum"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt, (row["n"], row["checksum"])

    out: dict[str, dict] = {}
    for name in args:
        # warmup both legs (codegen, fixture caches) before any timing
        set_fan(True)
        timed(name)
        set_fan(False)
        timed(name)
        a_s: list[float] = []
        b_s: list[float] = []
        sigs: set = set()
        for r in range(reps):
            for leg, samples in (("A", a_s), ("B", b_s)):
                set_fan(leg == "A")
                dt, sig = timed(name)
                samples.append(dt)
                sigs.add(sig)
                print(f"{name} rep {r + 1}/{reps} {leg}={'fan' if leg == 'A' else 'raw'}: {dt:.3f}s n={sig[0]}", file=sys.stderr)
        set_fan(True)
        med_a, med_b = statistics.median(a_s), statistics.median(b_s)
        out[name] = {
            "fan_median_sec": round(med_a, 3),
            "raw_median_sec": round(med_b, 3),
            "delta_fan_minus_raw": round(med_a - med_b, 3),
            "checksums_identical": len(sigs) == 1,
            "fan_samples": [round(s, 3) for s in a_s],
            "raw_samples": [round(s, 3) for s in b_s],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
