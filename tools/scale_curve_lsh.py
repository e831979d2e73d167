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


def minhash_phase_split(spark, docs, variant: str, hash_fn: str = "xxhash64") -> None:
    """Phase-timed MinHash-LSH with a swappable storage strategy for the
    base relation (VERDICT r11 item 6). Mirrors the shipped plan of
    operators/dedup.py:minhash_lsh_pairs (same params, same joins, same
    hints) with ONE knob — how the (id, shingles, signature) relation is
    retained between the candidate and verify phases:

      deser     — shipped: persist() default = MEMORY_AND_DISK_DESER
      ser       — MEMORY_AND_DISK (PySpark naming: serialized): smaller
                  cache footprint for the fat shingle arrays, CPU to
                  re-inflate on every read
      localckpt — localCheckpoint (lazy; materialized by the p1 count,
                  same as the persists): cuts lineage and stores
                  serialized blocks via the block manager (the "temp
                  table checkpoint" a cluster job would use)
      slim      — persist only (id, signature); the verify phase
                  RE-DERIVES shingles from the input (drops the fat array
                  from the cache at the price of re-scanning + re-hashing
                  the corpus twice, once per join side)

    Phases: p1 = build+materialize base (count), p2 = banded self-join
    candidate generation (count; candidates then persisted so p3 is pure
    verification), p3 = exact-Jaccard verify (final pair count). Keep the
    shipped plan unless an alternative is CLEARLY better at 1000x.
    """
    from pyspark.storagelevel import StorageLevel

    from cyrela_etl_spark.operators.dedup import (
        _cap_buckets,
        _minhash_banded,
        minhash_signature_expr,
        word_shingles,
    )

    num_hashes, bands, shingle_n, threshold, cap = 16, 4, 3, 0.5, 1000
    rows_per_band = num_hashes // bands
    t0 = time.perf_counter()
    full = (
        docs.select(
            F.col("doc_id").alias("id"),
            word_shingles(F.col("text"), shingle_n).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
        .withColumn(
            "signature", minhash_signature_expr(F.col("shingles"), num_hashes, hash_fn)
        )
    )
    if variant == "deser":
        base = full.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        sh = base.select("id", "shingles")
    elif variant == "ser":
        base = full.persist(StorageLevel.MEMORY_AND_DISK)
        sh = base.select("id", "shingles")
    elif variant == "localckpt":
        base = full.localCheckpoint(eager=False)
        sh = base.select("id", "shingles")
    elif variant == "slim":
        base = full.select("id", "signature").persist(StorageLevel.MEMORY_AND_DISK_DESER)
        sh = docs.select(
            F.col("doc_id").alias("id"),
            word_shingles(F.col("text"), shingle_n).alias("shingles"),
        ).filter(F.size("shingles") > 0)
    else:
        raise ValueError(f"unknown variant {variant}")
    n_docs = base.count()
    p1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    banded = _cap_buckets(
        _minhash_banded(base.select("id", "signature"), bands, rows_per_band),
        ["band", "bucket"],
        cap,
    )
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    n_cand = candidates.count()
    p2 = time.perf_counter() - t0

    t0 = time.perf_counter()
    inter = F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
    union = F.size(F.array_union(F.col("sa.shingles"), F.col("sb.shingles")))
    half = candidates.hint("shuffle_hash").join(
        sh.alias("sa"), F.col("id_a") == F.col("sa.id")
    )
    pairs = (
        half.join(sh.alias("sb"), F.col("id_b") == F.col("sb.id"))
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .count()
    )
    p3 = time.perf_counter() - t0
    print(
        f"PHASES variant={variant} docs={n_docs} candidates={n_cand} pairs={pairs} "
        f"p1_signature={p1:.1f}s p2_candidates={p2:.1f}s p3_verify={p3:.1f}s "
        f"total={p1 + p2 + p3:.1f}s",
        flush=True,
    )
    spark.catalog.clearCache()


def phases_main(argv: list[str]) -> None:
    import os

    scale = int(argv[0]) if argv else 1000
    variants = argv[1:] or ["deser", "ser", "localckpt", "slim"]
    spark = get_spark(app_name="scale-curve-lsh-phases")
    spark.sparkContext.setLogLevel("ERROR")
    # SPARK_GRAFT_LSH_REUSE=1 skips the corpus rebuild when the scaled
    # parquet already exists — variants that can kill the JVM (the ser
    # persist heap-OOMs at 1000x) are cheaper to re-run one per process.
    path = f"/tmp/scale_lsh_{scale}x"
    if not (
        os.environ.get("SPARK_GRAFT_LSH_REUSE")
        and os.path.exists(f"{path}/documents.parquet/_SUCCESS")
    ):
        path = build(spark, scale)
    docs = spark.read.parquet(f"{path}/documents.parquet")
    print(f"SCALE {scale}x docs={docs.count()}", flush=True)
    for v in variants:
        minhash_phase_split(spark, docs, v)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "phases":
        phases_main(sys.argv[2:])
        return
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
