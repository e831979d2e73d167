"""1x/10x/100x scaling curves for the banded LSH dedup family
(operators/dedup.py): MinHash-LSH pair generation in both hash configs
(md5 = the oracle-portable default, xxhash64 = the production fold) and
SimHash pigeonhole pairs at production-ish width (48 bits, max_hamming 2
→ 16-bit chunks).

Protocol (NOTES.md round-5/7 precedent, same as scale_curve_wave7):
replicate the sf0.1 documents corpus into /tmp parquet FIRST so the
timed leg measures the operator, not the union fan-in. Every token in
replica i carries an `r{i}x` prefix, so replica vocabularies are
DISJOINT: shingles, MinHash band buckets, and SimHash chunk values never
collide across replicas, duplicate-cluster structure is exactly
replicated, and the true pair set scales LINEARLY with the corpus. A
near-linear wall curve therefore demonstrates the banded equi-join
claim (shuffle on bucket keys, never n² compare); superlinear growth
would expose a hidden quadratic.

Both ops run with max_bucket_size=1000 — the hot-bucket guard that IS
the documented corpus-scale configuration.

Usage: python tools/scale_curve_lsh.py [scales...]   (default: 1 10 100)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def build(spark, scale: int) -> str:
    path = f"/tmp/scale_lsh_{scale}x"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    if scale <= 100:
        reps = []
        for i in range(scale):
            tag = f"r{i}x"
            reps.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.concat(
                        F.lit(tag), F.regexp_replace(F.col("text"), r"\s+", f" {tag}")
                    ).alias("text"),
                )
            )
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
    else:
        # beyond ~100 replicas an N-arm union costs minutes of driver
        # analysis (NOTES round-5/7 protocol) — replicate via broadcast
        # crossJoin with range(scale) and a COLUMN-valued tag instead
        reps = F.broadcast(spark.range(scale).select(F.col("id").alias("rep")))
        tag = F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("x"))
        out = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(
                tag, F.regexp_replace(F.col("text"), F.lit(r"\s+"), F.concat(F.lit(" "), tag))
            ).alias("text"),
        )
    out.repartition(max(4, scale)).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    return path


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 100]
    from cyrela_etl_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    import os

    legs = [
        ("minhash_md5", lambda df: minhash_lsh_pairs(df, max_bucket_size=1000)),
        (
            "minhash_xxh64",
            lambda df: minhash_lsh_pairs(df, max_bucket_size=1000, hash_fn="xxhash64"),
        ),
        (
            "simhash48",
            lambda df: simhash_pairs(
                df, bits=48, max_hamming=2, max_bucket_size=1000, hash_fn="xxhash64"
            ),
        ),
    ]
    only = os.environ.get("SPARK_GRAFT_LSH_LEGS")
    if only:
        wanted = {x.strip() for x in only.split(",")}
        legs = [leg for leg in legs if leg[0] in wanted]
    spark = get_spark(app_name="scale-curve-lsh")
    spark.sparkContext.setLogLevel("ERROR")
    for scale in scales:
        path = build(spark, scale)
        docs = spark.read.parquet(f"{path}/documents.parquet")
        n_docs = docs.count()
        for name, fn in legs:
            t0 = time.perf_counter()
            out = fn(docs)
            row = out.agg(F.count(F.lit(1)).alias("n")).collect()[0]
            dt = time.perf_counter() - t0
            print(
                f"RESULT scale={scale}x docs={n_docs} op={name} "
                f"pairs={row['n']} wall={dt:.1f}s",
                flush=True,
            )
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
