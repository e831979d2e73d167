"""1x/10x/100x scaling curves for the late round-7 operators
(containment pairs, LPA communities, RAKE keywords, n-gram novelty).

Protocol (NOTES.md round-5/7 precedent): replicate the sf0.1 documents
corpus into /tmp parquet FIRST so the timed leg measures the operator,
not the union fan-in. Each replica's tokens get a per-replica prefix so
vocabularies are disjoint — per-gram document frequency stays
scale-invariant (the rare-gram 2<=df<=5 window keeps firing) and no
cross-replica pairs inflate outputs superlinearly.

Usage: python tools/scale_curve_wave7.py [ops...]   (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCALES = [1, 10, 100]


def build(spark, scale: int) -> str:
    path = f"/tmp/scale_wave7_{scale}x"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
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
    out.repartition(max(4, scale)).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    return path


def main() -> None:
    only = set(sys.argv[1:])
    from cyrela_etl_spark.queries import load_all

    reg = load_all()
    ops = [
        "dedup_containment_pairs",
        "graph_lpa_communities",
        "text_rake_keywords",
        "text_ngram_novelty",
    ]
    if only:
        ops = [o for o in ops if o in only]
    spark = get_spark(app_name="scale-curve-wave7")
    spark.sparkContext.setLogLevel("ERROR")
    for scale in SCALES:
        path = build(spark, scale)
        n_docs = spark.read.parquet(f"{path}/documents.parquet").count()
        for op in ops:
            t0 = time.perf_counter()
            df = reg[op][0](spark, path)
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("ck"),
            ).collect()[0]
            dt = time.perf_counter() - t0
            print(
                f"RESULT scale={scale}x docs={n_docs} op={op} "
                f"rows={row['n']} wall={dt:.1f}s",
                flush=True,
            )
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
