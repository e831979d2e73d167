"""1x/10x/100x scale curve for the round-10 re-planned corpus_curriculum_stages
(the distributed-total-order plan: range partitions + per-range ranks +
prefix offsets — VERDICT r9 item 1).

Protocol mirrors the other tools/scale_curve_* scripts: the scaled corpus
is WRITTEN TO PARQUET FIRST (so the timed leg measures the operator, not
the union fan-in), replicas get shifted doc_ids so the total order grows
10x for real. Checks at each scale: positions are a permutation of 1..n
(sum == n(n+1)/2 and max == n — an exact pairing), ntile stage sizes
match the q/q+1 rule, and the executed plan contains no partition-less
window. Run on an idle box:

    python tools/scale_curve_curriculum.py [scales...]   (default: 1 10 100)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/curriculum_curve"


def build_corpus(spark, mult: int) -> str:
    path = f"{WORK}/docs_{mult}x"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n = docs.count()
    # Replicate via a broadcast crossJoin with range(mult), NOT a
    # mult-arm unionByName: a 1000-arm union plan costs minutes of
    # driver analysis/GC and polluted the first 1000x measurement
    # (116 s vs the true ~13 s once the corpus pre-existed).
    reps = F.broadcast(spark.range(mult).select(F.col("id").alias("__k")))
    out = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__k") * F.lit(n))
        .drop("__k")
    )
    out.write.mode("overwrite").parquet(path)
    return path


def run_leg(spark, sf_dir: str, mult: int) -> None:
    from cyrela_etl_spark.queries.textq import corpus_curriculum_stages

    t0 = time.perf_counter()
    df = corpus_curriculum_stages(spark, sf_dir)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("position").alias("pos_sum"),
        F.max("position").alias("pos_max"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    n = agg["n"]
    assert agg["pos_max"] == n and agg["pos_sum"] == n * (n + 1) // 2, "not a permutation"
    q, r = divmod(n, 4)
    sizes = {
        row["stage"]: row["c"]
        for row in df.groupBy("stage").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert sizes == {s: q + 1 if s <= r else q for s in range(1, 5)}, sizes
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = [seg.split(")", 1)[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs and all(s.startswith("pid#") for s in specs), "global window!"
    spark.catalog.clearCache()
    print(f"{mult:>3}x  n={n:>7}  wall={wall:6.2f}s  (permutation+ntile+plan OK)")


def main() -> None:
    spark = get_spark(app_name="curriculum-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup leg (codegen + shuffle machinery) so the 1x number is the
    # operator, not session startup
    from cyrela_etl_spark.queries.textq import corpus_curriculum_stages

    corpus_curriculum_stages(spark, BASE).count()
    spark.catalog.clearCache()
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    for mult in scales:
        path = BASE if mult == 1 else os.path.dirname(build_corpus(spark, mult))
        if mult != 1:
            # the query reads <dir>/documents.parquet
            target = f"{WORK}/sf_{mult}x/documents.parquet"
            if not os.path.exists(target):
                os.makedirs(os.path.dirname(target), exist_ok=True)
                os.symlink(os.path.abspath(build_corpus(spark, mult)), target)
            path = f"{WORK}/sf_{mult}x"
        run_leg(spark, path, mult)


if __name__ == "__main__":
    main()
