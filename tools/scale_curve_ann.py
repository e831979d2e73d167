"""1x/10x/100x/1000x scaling curves for the quantized-ANN ladder
(operators/similarity.py: ivf_topk, sq_int8_topk, pq_adc_topk,
ivf_pq_topk) — the last heavy family whose 100 TB story was
design-argument only (VERDICT r12 item 2).

Protocol (the scale_curve_graph replication discipline, adapted to
vectors): the BASE corpus is the registry's own embeddings table at
sf0.1 (2,000 vectors x dim 64), materialized to /tmp parquet once;
replica i keeps the vector VALUES and offsets vec_id by i*10_000_000.
The QUERY SET is the registry's fixed 8 base queries, NOT replicated —
query-time work is what must scale with the corpus.

Training is PINNED on the 1x base (the production contract at 100 TB:
IVF centroids and PQ codebooks are trained on a bounded sample, never
the full corpus), so every replica copy of a vector gets the same list
assignment and the same PQ code at every scale, which makes the
checksums below EXACT. The curve legs therefore compose the operators'
own internals (seed_centroids / _ivf_assign / pq_codebooks / pq_encode
/ the shared two-phase rank — similarity.py:247,308,579,621) with the
pinned training tables; a PARITY leg at 1x asserts each composed top-k
equals the public operator's output row-for-row (at 1x "trained on the
base" and "trained on the corpus" coincide, so parity is exact).

Two measurements per (scale, op):

- topk wall: the end-to-end ANN query (assignment/encode + candidate
  join + ADC/int-dot scoring + two-phase rank to k=5 per query).
- scored-checksum: count + integer score sum over ALL (query,
  candidate) pairs the op scores, WITHOUT the self-pair filter — on a
  value-identical replica corpus with pinned training this must be
  EXACTLY s-fold (count(s) = s*count(1), sum(s) = s*sum(1): identical
  rounded integer scores, s copies each). A drifting checksum means
  assignment or encoding is not per-row deterministic; a superlinear
  wall or shuffle-byte curve means a plan pathology (the LSH/graph
  curve protocol that caught the r11 merge-join double-sort).

Watch items named by the r12 verdict: the centroid-assignment
broadcast GEMM (mapInPandas — per-row, must stay linear) and the ADC
lookup join (codes x broadcast distance table — linear in code rows).

Per-leg shuffle volume is read from the Spark UI REST API (stage-level
totals, delta across the leg) — UI enabled for this tool only.

Usage: python tools/scale_curve_ann.py [scales...]   (default: 1 10 100 1000)
       SPARK_GRAFT_ANN_LEGS=ivf,sq_int8,pq_adc,ivf_pq to subset.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from cyrela_etl_spark.functions.vectors import (  # noqa: E402
    cosine_similarity,
    to_double_array,
)
from cyrela_etl_spark.operators.similarity import (  # noqa: E402
    _abs_max,
    _d2_ppm,
    _int_dot,
    _ivf_assign,
    _rank_window,
    _sub_explode,
    pq_codebooks,
    pq_encode,
    quantize_int8,
    seed_centroids,
)
from cyrela_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
K = 5  # queries/vectorq.py _K
N_QUERIES = 8  # queries/vectorq.py _N_QUERIES
N_CENT, NPROBE = 16, 2  # queries/vectorq.py vector_ivf_topk
M, KSUB, DIM = 8, 16, 64  # queries/vectorq.py vector_pq_adc_topk
REP_OFFSET = 10_000_000


def build_base(spark) -> str:
    path = "/tmp/scale_ann_1x"
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", to_double_array("embedding").alias("embedding")
    )
    emb.repartition(8).write.mode("overwrite").parquet(f"{path}/emb.parquet")
    return path


def build_scaled(spark, scale: int) -> str:
    if scale == 1:
        return "/tmp/scale_ann_1x"
    path = f"/tmp/scale_ann_{scale}x"
    base = spark.read.parquet("/tmp/scale_ann_1x/emb.parquet")
    reps = F.broadcast(spark.range(scale).select(F.col("id").alias("rep")))
    out = base.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * REP_OFFSET).alias("vec_id"),
        "embedding",
    )
    out.repartition(max(8, min(scale, 64))).write.mode("overwrite").parquet(
        f"{path}/emb.parquet"
    )
    return path


def queries_df(spark) -> DataFrame:
    return (
        spark.read.parquet("/tmp/scale_ann_1x/emb.parquet")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def two_phase_topk(scored: DataFrame, score_col: str, ascending: bool) -> DataFrame:
    """The shared two-phase rank (similarity.py pq_adc_topk / sq_int8_topk
    plan shape): per-partition prune to k, then the final k·partitions
    window."""
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col("vec_id").asc(),
    ]
    local_w = Window.partitionBy("query_id", "__pid").orderBy(*order)
    pruned = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrank", F.row_number().over(local_w))
        .filter(F.col("__lrank") <= K)
        .drop("__pid", "__lrank")
    )
    final_w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final_w))
        .filter(F.col("rank") <= K)
        .select("query_id", "rank", "vec_id", score_col)
    )


# --- composed legs (pinned training; mirrors cited at each site) -----------
def ivf_scored(data, queries, centroids, with_self: bool) -> DataFrame:
    """ivf_topk's probe plan (similarity.py:360) with pinned centroids."""
    d = _ivf_assign(data, centroids, 1, "vec_id", "embedding", "vec_id", 6)
    q = _ivf_assign(
        queries, centroids, NPROBE, "query_id", "embedding", "query_id", 6
    ).withColumnRenamed("v", "qv")
    cond = d["list_id"] == q["list_id"]
    if not with_self:
        cond = cond & (F.col("vec_id") != F.col("query_id"))
    cos = F.round(cosine_similarity(F.col("qv"), F.col("v")), 6)
    return d.join(F.broadcast(q), cond).select(
        "query_id", "vec_id", cos.alias("cosine")
    )


def ivf_leg(data, queries, centroids) -> DataFrame:
    scored = ivf_scored(data, queries, centroids, with_self=False)
    return (
        scored.withColumn("rank", F.row_number().over(_rank_window()))
        .filter(F.col("rank") <= K)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def sq_scored(data, queries, with_self: bool) -> DataFrame:
    """sq_int8_topk's quantize + integer-dot scoring (similarity.py:511)."""

    def _quant(df, idc, qname):
        d0 = df.select(F.col(idc), F.col("embedding").alias("v"))
        withv = d0.select("*", _abs_max(F.col("v")).alias("s"))
        return withv.select(idc, quantize_int8(F.col("v"), F.col("s")).alias(qname))

    d = _quant(data, "vec_id", "qd").select(
        "vec_id", "qd", _int_dot(F.col("qd"), F.col("qd")).alias("nd")
    )
    q = _quant(queries, "query_id", "qq").select(
        "query_id", "qq", _int_dot(F.col("qq"), F.col("qq")).alias("nq")
    )
    cos = F.round(
        _int_dot(F.col("qq"), F.col("qd")) / (F.sqrt(F.col("nq")) * F.sqrt(F.col("nd"))),
        6,
    )
    cond = F.col("vec_id") != F.col("query_id") if not with_self else F.lit(True)
    return d.join(F.broadcast(q), cond).select(
        "query_id", "vec_id", cos.alias("cosine")
    )


def sq_leg(data, queries) -> DataFrame:
    return two_phase_topk(
        sq_scored(data, queries, with_self=False), "cosine", ascending=False
    )


def pq_scored(data, queries, books, with_self: bool) -> DataFrame:
    """pq_adc_topk's encode + distance-table lookup (similarity.py:654)
    with pinned codebooks."""
    dsub = DIM // M
    codes = pq_encode(data, books, M, dsub, id_col="vec_id", vec_col="embedding")
    qsubs = _sub_explode(
        queries.select(F.col("query_id"), F.col("embedding").alias("v")),
        M,
        dsub,
        "query_id",
    )
    dtable = qsubs.join(F.broadcast(books), "j").select(
        "query_id", "j", "cid", _d2_ppm(F.col("sub"), F.col("cv")).alias("d2_ppm")
    )
    joined = codes.join(
        F.broadcast(dtable),
        (codes["j"] == dtable["j"]) & (codes["code"] == dtable["cid"]),
    )
    if not with_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    return joined.groupBy("query_id", F.col("id").alias("vec_id")).agg(
        F.sum("d2_ppm").cast("long").alias("adc_ppm")
    )


def pq_leg(data, queries, books) -> DataFrame:
    return two_phase_topk(
        pq_scored(data, queries, books, with_self=False), "adc_ppm", ascending=True
    )


def ivfpq_scored(data, queries, centroids, books, with_self: bool) -> DataFrame:
    """ivf_pq_topk's candidate-restriction-first plan (similarity.py:719)
    with pinned centroids + codebooks."""
    dsub = DIM // M
    lists = _ivf_assign(data, centroids, 1, "vec_id", "embedding", "vec_id", 6).select(
        "vec_id", "list_id"
    )
    qlists = _ivf_assign(
        queries, centroids, NPROBE, "query_id", "embedding", "query_id", 6
    ).select("query_id", "list_id")
    codes = pq_encode(data, books, M, dsub, id_col="vec_id", vec_col="embedding")
    qsubs = _sub_explode(
        queries.select(F.col("query_id"), F.col("embedding").alias("v")),
        M,
        dsub,
        "query_id",
    )
    dtable = qsubs.join(F.broadcast(books), "j").select(
        "query_id", "j", "cid", _d2_ppm(F.col("sub"), F.col("cv")).alias("d2_ppm")
    )
    cand = codes.join(lists, codes["id"] == lists["vec_id"]).join(
        F.broadcast(qlists), "list_id"
    )
    joined = cand.join(
        F.broadcast(dtable),
        (cand["j"] == dtable["j"])
        & (cand["code"] == dtable["cid"])
        & (cand["query_id"] == dtable["query_id"]),
    )
    if not with_self:
        joined = joined.filter(F.col("id") != cand["query_id"])
    return joined.groupBy(cand["query_id"], F.col("id").alias("vec_id")).agg(
        F.sum("d2_ppm").cast("long").alias("adc_ppm")
    )


def ivfpq_leg(data, queries, centroids, books) -> DataFrame:
    return two_phase_topk(
        ivfpq_scored(data, queries, centroids, books, with_self=False),
        "adc_ppm",
        ascending=True,
    )


def shuffle_totals(spark) -> tuple[int, int]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def parity_check(spark, queries) -> None:
    """At 1x, each composed leg must equal the public operator row-for-row
    (pinned-on-base training == the operator's own corpus training)."""
    from cyrela_etl_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_topk,
        pq_adc_topk,
        sq_int8_topk,
    )

    data = spark.read.parquet("/tmp/scale_ann_1x/emb.parquet")
    centroids = seed_centroids(data, N_CENT)
    books = pq_codebooks(data, M, KSUB, DIM)
    pairs = [
        ("ivf", ivf_leg(data, queries, centroids),
         ivf_topk(data, queries, k=K, n_centroids=N_CENT, nprobe=NPROBE)),
        ("sq_int8", sq_leg(data, queries), sq_int8_topk(data, queries, k=K)),
        ("pq_adc", pq_leg(data, queries, books),
         pq_adc_topk(data, queries, k=K, m=M, ksub=KSUB, dim=DIM)),
        ("ivf_pq", ivfpq_leg(data, queries, centroids, books),
         ivf_pq_topk(data, queries, k=K, n_centroids=N_CENT, nprobe=NPROBE,
                     m=M, ksub=KSUB, dim=DIM)),
    ]
    for name, composed, public in pairs:
        a = sorted(map(tuple, composed.collect()))
        b = sorted(map(tuple, public.collect()))
        assert a == b, f"PARITY FAIL {name}: composed leg != public operator"
        print(f"PARITY ok {name}: {len(a)} rows identical", flush=True)
        spark.catalog.clearCache()


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 100, 1000]
    spark = get_spark(app_name="scale-curve-ann", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    build_base(spark)
    q = queries_df(spark)
    parity_check(spark, q)

    base = spark.read.parquet("/tmp/scale_ann_1x/emb.parquet")
    centroids = seed_centroids(base, N_CENT)  # pinned: trained on 1x base
    books_rows = pq_codebooks(base, M, KSUB, DIM).collect()  # pinned

    def books_df():
        return spark.createDataFrame(
            [(r["j"], r["cid"], list(r["cv"])) for r in books_rows],
            "j long, cid long, cv array<double>",
        )

    legs = [
        ("ivf",
         lambda d: ivf_leg(d, q, centroids),
         lambda d: ivf_scored(d, q, centroids, with_self=True)),
        ("sq_int8",
         lambda d: sq_leg(d, q),
         lambda d: sq_scored(d, q, with_self=True)),
        ("pq_adc",
         lambda d: pq_leg(d, q, books_df()),
         lambda d: pq_scored(d, q, books_df(), with_self=True)),
        ("ivf_pq",
         lambda d: ivfpq_leg(d, q, centroids, books_df()),
         lambda d: ivfpq_scored(d, q, centroids, books_df(), with_self=True)),
    ]
    only = os.environ.get("SPARK_GRAFT_ANN_LEGS")
    if only:
        wanted = {x.strip() for x in only.split(",")}
        legs = [leg for leg in legs if leg[0] in wanted]

    score_col = {"ivf": "cosine", "sq_int8": "cosine", "pq_adc": "adc_ppm",
                 "ivf_pq": "adc_ppm"}
    mib = 1024**2
    for scale in scales:
        path = build_scaled(spark, scale)
        data = spark.read.parquet(f"{path}/emb.parquet")
        n = data.count()
        for name, topk_fn, scored_fn in legs:
            sr0, sw0 = shuffle_totals(spark)
            t0 = time.perf_counter()
            rows = topk_fn(data).collect()
            t_topk = time.perf_counter() - t0
            spark.catalog.clearCache()
            col = score_col[name]
            ppm = (
                F.round(F.col(col) * 1_000_000).cast("long")
                if col == "cosine"
                else F.col(col)
            )
            t0 = time.perf_counter()
            chk = (
                scored_fn(data)
                .agg(F.count(F.lit(1)).alias("n"), F.sum(ppm).alias("s"))
                .collect()[0]
            )
            t_chk = time.perf_counter() - t0
            sr1, sw1 = shuffle_totals(spark)
            print(
                f"RESULT scale={scale}x vectors={n} op={name} "
                f"topk_wall={t_topk:.1f}s chk_wall={t_chk:.1f}s "
                f"shuffle_read={(sr1 - sr0) / mib:.1f}MiB "
                f"shuffle_write={(sw1 - sw0) / mib:.1f}MiB "
                f"topk_rows={len(rows)} scored_n={chk['n']} scored_sum={chk['s']}",
                flush=True,
            )
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
