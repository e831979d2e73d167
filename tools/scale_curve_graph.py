"""1x/10x/100x scaling curves for the graph family (operators/graph.py
+ the k-core peel from queries/round8q.py) — the heaviest shuffle-site
plans in PLAN_REPORT (k-core 20, LPA 17, PageRank 10) and, until this
tool, the only heavy family without a measured curve (VERDICT r11
item 4).

Protocol (the scale_curve_lsh replication discipline): the BASE edge
list is the registry's own LPA input — the shingle-blocked document
pair graph from queries/textq.py:graph_lpa_communities at sf0.1 —
materialized to /tmp parquet ONCE so every timed leg measures the graph
operator, not edge generation. Replica i offsets BOTH vertex ids by
i * 10_000_000, so replicas are vertex-DISJOINT: the scaled graph is s
identical connected-component families side by side, per-vertex degree
distribution unchanged, true triangle/wedge/community structure exactly
s-fold. Every operator here does per-round work proportional to
sum-over-vertices of local quantities (degrees, wedge fan-out, vote
counts), so on a disjoint union the TRUE work scales linearly — a
superlinear WALL curve would expose a plan pathology (the LSH-curve
protocol that caught the merge-join double-sort in round 11), and a
superlinear SHUFFLE curve would expose a broadcast-or-sort of something
graph-sized.

Per-leg shuffle volume is read from the Spark UI REST API (stage-level
shuffle read/write byte totals, delta across the leg) — the UI is
enabled for this tool only; the engine default keeps it off.

Outputs one RESULT line per (scale, op): wall seconds, shuffle GiB, and
an op-specific checksum that must scale EXACTLY s-fold (triangles,
pagerank rank-sum, LPA community count, k-core survivor counts) — the
correctness half of the curve.

Usage: python tools/scale_curve_graph.py [scales...]   (default: 1 10 100)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
_LP_DF_MIN, _LP_DF_MAX = 2, 5  # queries/textq.py:2520 — the registry's LPA blocking
_KCORE_K = 2  # queries/round8q.py graph_kcore_peel


def build_base(spark) -> str:
    """Materialize the registry LPA edge graph at sf0.1 to parquet."""
    from cyrela_etl_spark.operators import dedup as D

    path = "/tmp/scale_graph_1x"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    posting = docs.select(
        F.col("doc_id"), F.explode(D.word_shingles(F.col("text"), n=3)).alias("g")
    )
    df_ok = (
        posting.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= _LP_DF_MIN) & (F.col("df") <= _LP_DF_MAX))
        .select("g")
    )
    kept = posting.join(df_ok, "g").persist()
    a, b = kept.alias("a"), kept.alias("b")
    edges = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    edges.repartition(8).write.mode("overwrite").parquet(f"{path}/edges.parquet")
    kept.unpersist()
    return path


def build_scaled(spark, scale: int) -> str:
    if scale == 1:
        return "/tmp/scale_graph_1x"
    path = f"/tmp/scale_graph_{scale}x"
    base = spark.read.parquet("/tmp/scale_graph_1x/edges.parquet")
    reps = F.broadcast(spark.range(scale).select(F.col("id").alias("rep")))
    out = base.crossJoin(reps).select(
        (F.col("id_a") + F.col("rep") * 10_000_000).alias("id_a"),
        (F.col("id_b") + F.col("rep") * 10_000_000).alias("id_b"),
    )
    out.repartition(max(8, scale)).write.mode("overwrite").parquet(f"{path}/edges.parquet")
    return path


def kcore_rounds(e0: DataFrame) -> DataFrame:
    """Two unrolled k=2 peel rounds — the graph_kcore_peel plan shape
    (queries/round8q.py:892, r13 degree-table diet: one deg agg per round
    feeds both the stats row and the keep-set; n_edges = sum(deg)/2 is
    exact on distinct id_a < id_b edges), parameterized on an edge
    DataFrame."""

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("id_a").alias("v"))
            .unionByName(e.select(F.col("id_b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    def stats(deg: DataFrame, rnd: int) -> DataFrame:
        return deg.agg(
            F.lit(rnd).cast("long").alias("round"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            (F.coalesce(F.sum("deg"), F.lit(0)) / 2).cast("long").alias("n_edges"),
        )

    def induce(e: DataFrame, keep: DataFrame) -> DataFrame:
        return (
            e.join(keep.withColumnRenamed("v", "id_a"), "id_a", "left_semi")
            .join(keep.withColumnRenamed("v", "id_b"), "id_b", "left_semi")
            .select("id_a", "id_b")
        )

    e0 = e0.persist()
    deg0 = degrees(e0).persist()
    e1 = induce(e0, deg0.filter(F.col("deg") >= _KCORE_K).select("v")).persist()
    deg1 = degrees(e1).persist()
    e2 = induce(e1, deg1.filter(F.col("deg") >= _KCORE_K).select("v"))
    return stats(deg0, 0).unionByName(stats(deg1, 1)).unionByName(stats(degrees(e2), 2))


def shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all completed
    stages, via the UI REST API; deltas across a leg = the leg's volume."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    import os

    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 100]
    from cyrela_etl_spark.operators.graph import (
        integer_pagerank,
        label_propagation,
        triangle_stats,
    )

    legs = [
        (
            "triangles",
            lambda e: triangle_stats(e),
            lambda rows: f"wedges={rows[0]['n_wedges']} triangles={rows[0]['n_triangles']}",
        ),
        (
            "pagerank_2it",
            lambda e: integer_pagerank(e, iterations=2).agg(
                F.count(F.lit(1)).alias("n"), F.sum("rank_ppb").alias("rank_sum")
            ),
            lambda rows: f"nodes={rows[0]['n']} rank_sum={rows[0]['rank_sum']}",
        ),
        (
            "lpa_2it",
            lambda e: label_propagation(e, iterations=2).agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct("community").alias("n_comm"),
            ),
            lambda rows: f"nodes={rows[0]['n']} communities={rows[0]['n_comm']}",
        ),
        (
            "kcore_2rounds",
            kcore_rounds,
            lambda rows: " ".join(
                f"r{r['round']}=({r['n_nodes']}n,{r['n_edges']}e)"
                for r in sorted(rows, key=lambda x: x["round"])
            ),
        ),
    ]
    only = os.environ.get("SPARK_GRAFT_GRAPH_LEGS")
    if only:
        wanted = {x.strip() for x in only.split(",")}
        legs = [leg for leg in legs if leg[0] in wanted]

    conf = {"spark.ui.enabled": "true"}
    # Root-cause knob for shuffle-byte curve analysis: at small scales AQE
    # converts node-scale join sides (degree tables, label relations, the
    # canonical edge set) to broadcasts, so their bytes never hit the
    # shuffle counters; once those relations outgrow the threshold the
    # bytes step back in, which reads as superlinear byte growth even
    # when per-row work is exactly linear. Set
    # SPARK_GRAFT_GRAPH_BCAST=-1 to forbid broadcasts and measure the
    # all-shuffle byte baseline at any scale.
    bcast = os.environ.get("SPARK_GRAFT_GRAPH_BCAST")
    if bcast:
        conf["spark.sql.autoBroadcastJoinThreshold"] = bcast
    spark = get_spark(app_name="scale-curve-graph", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    build_base(spark)
    spark.catalog.clearCache()
    for scale in scales:
        path = build_scaled(spark, scale)
        edges = spark.read.parquet(f"{path}/edges.parquet")
        n_edges = edges.count()
        for name, fn, fmt in legs:
            sr0, sw0 = shuffle_totals(spark)
            t0 = time.perf_counter()
            rows = fn(edges).collect()
            dt = time.perf_counter() - t0
            sr1, sw1 = shuffle_totals(spark)
            mib = 1024**2
            print(
                f"RESULT scale={scale}x edges={n_edges} op={name} wall={dt:.1f}s "
                f"shuffle_read={(sr1 - sr0) / mib:.1f}MiB "
                f"shuffle_write={(sw1 - sw0) / mib:.1f}MiB {fmt(rows)}",
                flush=True,
            )
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
