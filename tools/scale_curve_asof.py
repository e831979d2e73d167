"""1x/10x/100x scaling curve for the temporal join pair: union-merge
as-of join and the bucketized range join.

Protocol (NOTES.md round-5/7 precedent): build each scaled corpus by
replicating the sf0.1 events table with per-replica user_id/event_id
shifts (key spaces stay DISJOINT, so matched fractions and pair counts
replicate exactly — output is linear in input by construction) and write
it to /tmp parquet FIRST, so the timed leg measures the operator, not
the union fan-in. Left = purchases, right = views per user.

Invariants asserted at every scale:
- as-of output is left-preserving (|out| == |left|) and its matched
  count is exactly scale x the 1x matched count;
- range-join pair count is exactly scale x the 1x pair count;
- the as-of executed plan contains exactly ONE exchange (the __key
  shuffle feeding the single merge window) — the no-range-explosion
  property the union-merge formulation exists for.

Usage: python tools/scale_curve_asof.py [scales...]   (default: 1 10 100)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.operators.temporal import asof_join, range_join_buckets  # noqa: E402
from cyrela_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_asof"


def build(spark, scale: int) -> str:
    path = f"{WORK}/events_{scale}x"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # broadcast crossJoin replication, not a scale-arm union: the plan
    # stays constant-size at any replication factor
    reps = F.broadcast(spark.range(scale).select(F.col("id").alias("__k")))
    out = events.crossJoin(reps).select(
        (F.col("event_id") + F.col("__k") * F.lit(100_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__k") * F.lit(10_000_000)).alias("user_id"),
        "event_type",
        "value",
    )
    out.repartition(max(32, 4 * scale)).write.mode("overwrite").parquet(path)
    return path


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")


def run_leg(spark, scale: int, base: dict) -> None:
    events = spark.read.parquet(build(spark, scale))
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    right = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("value").alias("v_value")
    )

    t0 = time.perf_counter()
    joined = asof_join(
        left, right, on="user_id", left_ts="p_ts", right_ts="v_ts",
        right_value_cols=["v_value"],
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("v_value_asof").alias("matched"),
    ).collect()[0]
    asof_wall = time.perf_counter() - t0
    n_left = left.count()
    assert agg["n"] == n_left, f"as-of not left-preserving: {agg['n']} vs {n_left}"
    ex = n_exchanges(joined)
    assert ex == 1, f"as-of plan has {ex} exchanges (want exactly the __key shuffle)"

    t0 = time.perf_counter()
    pairs = range_join_buckets(
        left, right, on="user_id", left_ts="p_ts", right_ts="v_ts", window_seconds=3600
    )
    n_pairs = pairs.count()
    range_wall = time.perf_counter() - t0

    if scale == 1:
        base["matched"], base["pairs"] = agg["matched"], n_pairs
    else:
        assert agg["matched"] == scale * base["matched"], (agg["matched"], base["matched"])
        assert n_pairs == scale * base["pairs"], (n_pairs, base["pairs"])
    spark.catalog.clearCache()
    print(
        f"{scale:>3}x  left={n_left:>8}  asof matched={agg['matched']:>8} "
        f"wall={asof_wall:6.2f}s | range pairs={n_pairs:>9} wall={range_wall:6.2f}s "
        f"(left-preserving + 1-exchange + linear-output OK)"
    )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="asof-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (codegen + shuffle machinery) so the 1x leg times the operator
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(1000)
    asof_join(
        ev.select("event_id", "user_id", F.col("ts").alias("p_ts")),
        ev.select("user_id", F.col("ts").alias("v_ts"), "value"),
        on="user_id", left_ts="p_ts", right_ts="v_ts", right_value_cols=["value"],
    ).count()
    spark.catalog.clearCache()
    base: dict = {}
    for scale in scales:
        run_leg(spark, scale, base)


if __name__ == "__main__":
    main()
