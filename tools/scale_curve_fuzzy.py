"""Fuzzy-match (edit-distance-1 blocking) scaling curves — VERDICT r13
item 5: the deletion-/substitution-neighborhood blocked joins
(queries/relational.py fuzzy_match_names / fuzzy_match_names_indel) are
the last join-heavy family without a measured curve. The watch item is
CANDIDATE GROWTH: the variant equi-join emits sum(bucket^2) candidate
rows over variant-key buckets, so the curve must show pair volume and
bucket sizes staying linear/flat as the name corpus scales.

Corpus construction (parquet-first protocol, exact s-fold contract):
the base is a synthetic TPC-H-shaped name table ("Customer#%09d" —
the real generator's format, so masked variants collide on digit
positions and buckets are structurally ~10-wide, matching production
shape, NOT disjoint toy strings). Scale s replicates the base with a
replica tag of three REPEATED digit-pair codes ("aaa-", "bab-", ...):
any two distinct tags differ in >= 3 character positions, so no masked
variant (needs <= 1 differing position) and no deletion variant
(needs edit distance <= 1) can collide across replicas — within-replica
results are bit-identical per replica, and every count is EXACTLY
s-fold by construction. A deviation means the blocking leaked
cross-replica candidates (superlinear growth at scale).

Per scale s (names = s * BASE_NAMES):

- build: write the replicated customer table to /tmp parquet (untimed).
- bucket_profile: max/mean variant-bucket width for BOTH blockings —
  must stay flat in s (the quadratic-candidate guard).
- sub / indel: run the registered query function end-to-end against the
  scaled dir; wall + output rows; rows must be exactly s * base rows.

Usage: python tools/scale_curve_fuzzy.py [scales...]   (default 1 10 100)
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402

BASE_NAMES = 15_000  # ~sf0.1 customer cardinality


def _tags(spark, s: int):
    """s replica tags, pairwise edit distance >= 3: a 2-char code from a
    10x10 digit grid, repeated 3 times ('ddd' pattern on pairs)."""
    rows = [(k, f"{k // 10}{k % 10}" * 3 + "-") for k in range(s)]
    return spark.createDataFrame(rows, "replica INT, tag STRING")


def build(spark, s: int, root: str) -> str:
    shutil.rmtree(root, ignore_errors=True)
    base = spark.range(1, BASE_NAMES + 1).select(
        F.col("id").alias("base_key"),
        F.format_string("Customer#%09d", F.col("id")).alias("base_name"),
    )
    cust = (
        base.join(F.broadcast(_tags(spark, s)), how="cross")
        .select(
            (F.col("base_key") + F.col("replica").cast("long") * BASE_NAMES).alias(
                "c_custkey"
            ),
            F.concat(F.col("tag"), F.col("base_name")).alias("c_name"),
        )
    )
    cust.write.mode("overwrite").parquet(f"{root}/customer.parquet")
    return root


def bucket_profile(spark, sf_dir: str) -> dict:
    from cyrela_etl_spark.queries.relational import _t

    names = (
        _t(spark, sf_dir, "customer")
        .select("c_name")
        .filter(F.length("c_name") >= 1)
        .distinct()
    )
    masked = names.select(
        F.explode(F.sequence(F.lit(1), F.length("c_name"))).alias("pos"),
        F.col("c_name"),
    ).select(
        F.concat(
            F.expr("substring(c_name, 1, pos - 1)"),
            F.lit("*"),
            F.expr("substring(c_name, pos + 1, length(c_name))"),
        ).alias("k"),
        "pos",
    )
    sub = (
        masked.groupBy("pos", "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("avg"))
        .collect()[0]
    )
    dels = names.select(
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("c_name")),
                    F.transform(
                        F.sequence(F.lit(1), F.length("c_name")),
                        lambda p: F.concat(
                            F.col("c_name").substr(F.lit(1), p - 1),
                            F.col("c_name").substr(p + 1, F.length("c_name")),
                        ),
                    ),
                )
            )
        ).alias("k")
    )
    ind = (
        dels.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("avg"))
        .collect()[0]
    )
    return {
        "sub_max": sub["mx"],
        "sub_avg": round(float(sub["avg"]), 3),
        "indel_max": ind["mx"],
        "indel_avg": round(float(ind["avg"]), 3),
    }


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="scale-curve-fuzzy")
    spark.sparkContext.setLogLevel("ERROR")
    from cyrela_etl_spark.queries.relational import (
        fuzzy_match_names,
        fuzzy_match_names_indel,
    )

    base_rows: dict[str, int] = {}
    for s in scales:
        root = f"/tmp/scale_fuzzy_{s}"
        build(spark, s, root)
        prof = bucket_profile(spark, root)
        print(f"RESULT scale={s} leg=bucket_profile {prof}", flush=True)

        for leg, fn in (("sub", fuzzy_match_names), ("indel", fuzzy_match_names_indel)):
            t0 = time.perf_counter()
            rows = fn(spark, root).count()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            fold = ""
            if s == scales[0]:
                base_rows[leg] = rows // s if rows % s == 0 else -1
            if base_rows.get(leg, -1) > 0:
                exact = rows == base_rows[leg] * s
                fold = f" s_fold_exact={exact}"
                assert exact, (
                    f"{leg}@{s}: rows={rows}, want {base_rows[leg] * s} — "
                    "blocking leaked cross-replica candidates"
                )
            print(
                f"RESULT scale={s} leg={leg} wall={wall:.2f}s rows={rows}{fold}",
                flush=True,
            )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
