"""Graph statistics over pair/edge relations (the similarity and dedup
operators emit edge lists; connected components lives in
operators/dedup.py next to its consumers).

Triangle counting is the classic "needs care at scale" graph op: the
naive wedge join explodes on hub nodes. The standard fix (node-iterator++
/ Cohen's MapReduce formulation, Suri & Vassilvitskii 2011) orients every
edge from the lower-degree endpoint to the higher-degree one, which
bounds each node's out-degree by O(sqrt(m)) and therefore the wedge join
by O(m^1.5) — the proven bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    orient_by_degree: bool = True,
) -> DataFrame:
    """One-row graph summary: nodes, edges, ordered wedges, triangles and
    the closure ratio (triangles/wedges — one exact-int IEEE division).

    ``orient_by_degree=True`` (production default) re-orients each edge
    low-degree → high-degree (ties by id) before the wedge join, giving
    the O(m^1.5) bound regardless of hubs. ``False`` keeps the input's
    id-ascending orientation — same COUNTS (triangle identity is
    orientation-free), simpler plan, and the spelling a SQL oracle
    replays directly; use it when ids are uncorrelated with degree.

    Plan: distinct edge set → (optional) degree agg + re-orient →
    self-join on the shared middle vertex (the wedge) → semi-join wedges
    against the edge set → four scalar counts. Every join is an
    equi-join; shuffle keys are vertex ids.
    """
    e = edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).distinct()
    if orient_by_degree:
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
        db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
        keyed = e.join(da, "a").join(db, "b")
        fwd = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        e = keyed.select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("a"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("b"),
        )
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    wedges = x.join(y, F.col("x.b") == F.col("y.a")).select(
        F.col("x.a").alias("wa"), F.col("x.b").alias("wb"), F.col("y.b").alias("wc")
    )
    closed = wedges.join(
        z,
        (
            ((F.col("z.a") == F.col("wa")) & (F.col("z.b") == F.col("wc")))
            | ((F.col("z.a") == F.col("wc")) & (F.col("z.b") == F.col("wa")))
        ),
        "left_semi",
    )
    nodes = e.select(F.col("a").alias("v")).unionAll(e.select(F.col("b").alias("v"))).distinct()
    counts = (
        nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        .crossJoin(wedges.agg(F.count(F.lit(1)).cast("long").alias("n_wedges")))
        .crossJoin(closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
    )
    return counts.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        (F.col("n_triangles") / F.col("n_wedges")).alias("closure_ratio"),
    )
