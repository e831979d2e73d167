"""1x/10x/100x scaling curve for SemDeDup on a planted MASS-DUP embedding
corpus (VERDICT r7 item 6 remainder / r8 item 5).

Corpus at scale s: N = 2_000·s vectors, dim 32; 90% background (distinct,
seeded numpy normals) + 10% exact copies spread over 20 hub vectors, so
hub group size grows linearly with N (10 -> 100 -> 1000 copies) — the
worst realistic shape (boilerplate pages embedded everywhere).

Two measured paths per scale, parquet-first protocol (data is written to
/tmp before any timed leg, NOTES round-5/7 precedent):

- RAW  : semdedup_pairs with n_clusters ∝ N (the knob, E|cluster| ≈ 250).
         Pair OUTPUT still blows up quadratically with hub size —
         C(|hub|,2)·20 pairs are genuinely emitted.
- COLL : collapse_exact_embeddings first (one hash shuffle), then the
         same knob-scaled semdedup over representatives. Σ|cluster|²
         and pair output stay near-linear; group_size carries the mass.

Usage: python tools/scale_curve_semdedup.py [max_scale]   (default 100)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.operators.similarity import (  # noqa: E402
    _ivf_assign,
    collapse_exact_embeddings,
    seed_centroids,
    semdedup_pairs,
)
from cyrela_etl_spark.session import get_spark  # noqa: E402

DIM = 32
BASE_N = 2_000
N_HUBS = 20
HUB_FRACTION = 0.10
TARGET_CLUSTER = 250


def build(spark, scale: int) -> str:
    path = f"/tmp/scale_semdedup_{scale}x"
    n = BASE_N * scale
    n_hub_rows = int(n * HUB_FRACTION)
    n_bg = n - n_hub_rows
    rng = np.random.default_rng(42)
    bg = rng.normal(size=(n_bg, DIM))
    hubs = rng.normal(size=(N_HUBS, DIM))
    rows = [(i, bg[i].tolist()) for i in range(n_bg)]
    rows += [
        (n_bg + j, hubs[j % N_HUBS].tolist()) for j in range(n_hub_rows)
    ]
    spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>").repartition(
        max(4, scale)
    ).write.mode("overwrite").parquet(path)
    return path


def sum_sq_sizes(df, n_clusters, id_col, vec_col) -> tuple[int, int]:
    cents = seed_centroids(df, n_clusters, id_col=id_col, vec_col=vec_col)
    agg = (
        _ivf_assign(df, cents, 1, id_col, vec_col, "vec_id", 6)
        .groupBy("list_id")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("ss"), F.max("count").alias("mx"))
        .collect()[0]
    )
    return int(agg["ss"]), int(agg["mx"])


def main() -> None:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="scale-curve-semdedup")
    print("| scale | N | n_clusters | path | Σ|c|² | max|c| | pairs | wall |")
    for scale in (1, 10, 100):
        if scale > max_scale:
            break
        path = build(spark, scale)
        data = spark.read.parquet(path)
        n = BASE_N * scale
        n_clusters = max(8, n // TARGET_CLUSTER)
        for tag in ("raw", "coll"):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            if tag == "raw":
                target = data
                id_col, vec_col = "vec_id", "embedding"
            else:
                target, _membership = collapse_exact_embeddings(data)
                id_col, vec_col = "vec_id", "v"
            ss, mx = sum_sq_sizes(target, n_clusters, id_col, vec_col)
            pairs = semdedup_pairs(
                target, n_clusters=n_clusters, threshold=0.999,
                id_col=id_col, vec_col=vec_col,
            ).count()
            wall = time.monotonic() - t0
            print(
                f"| {scale}x | {n} | {n_clusters} | {tag} | {ss} | {mx} "
                f"| {pairs} | {wall:.1f} s |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
