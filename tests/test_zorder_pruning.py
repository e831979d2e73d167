"""Z-order pruning PROOF (VERDICT r6 item 6): zorder_cluster_stats reports
min/max rectangles, but the contract that matters is that a filter on the
SECOND key actually skips data under a z-ordered layout and cannot under a
single-key linear sort. Two independent witnesses:

1. parquet footer audit (pyarrow): how many FILES could contain the
   predicate range per each file's k2 min/max — the exact file-grain
   zone-map question a lakehouse scan planner (Delta/Iceberg) asks;
2. the executed Spark scan's own metrics: with parquet filter pushdown,
   row-group stats skip whole groups, so the scan's numOutputRows (rows
   surfaced BEFORE Spark's residual filter) collapses on the z-ordered
   layout and stays at full size on the linear one.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

K = 1024  # key domain (10 bits each)
N = 200_000
N_FILES = 32
LO, HI = 300, 331  # 32/1024 ≈ 3% selective band on k2


def _dataset(spark):
    return spark.range(N).select(
        (F.col("id") % K).alias("k1"),
        F.pmod(F.xxhash64("id"), F.lit(K)).alias("k2"),
    )


def _scan_rows(df) -> tuple[int, int]:
    """(numFiles, numOutputRows) of the parquet scan node actually executed."""
    df.collect()
    node = df._jdf.queryExecution().executedPlan()
    stack = [node]
    while stack:
        n = stack.pop()
        if n.nodeName().startswith("Scan parquet"):
            vals = {}
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            return int(vals["numFiles"]), int(vals["numOutputRows"])
        for i in range(n.children().size()):
            stack.append(n.children().apply(i))
        if n.children().size() == 0 and hasattr(n, "child"):
            stack.append(n.child())
    raise AssertionError("no parquet scan node found")


def _files_intersecting(path: str, lo: int, hi: int) -> tuple[int, int]:
    """(intersecting, total) files whose k2 footer min/max overlaps [lo, hi]."""
    files = glob.glob(f"{path}/*.parquet")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        c = schema_idx["k2"]
        fmin = min(md.row_group(g).column(c).statistics.min for g in range(md.num_row_groups))
        fmax = max(md.row_group(g).column(c).statistics.max for g in range(md.num_row_groups))
        if fmin <= hi and fmax >= lo:
            hit += 1
    return hit, len(files)


def test_zorder_layout_prunes_second_key(spark, tmp_path):
    from cyrela_etl_spark.operators.zorder import write_zordered

    df = _dataset(spark)
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zorder")
    # linear: the classic single-key sort — perfect on k1, nothing on k2
    df.repartitionByRange(N_FILES, "k1").sortWithinPartitions("k1").write.parquet(linear)
    write_zordered(df, zordered, "k1", "k2", bits=10, n_files=N_FILES)

    # witness 1: file-grain zone maps. Every linear file spans the whole
    # k2 domain; z-ordered files are rectangles, so most fall outside the
    # band entirely.
    lin_hit, lin_total = _files_intersecting(linear, LO, HI)
    z_hit, z_total = _files_intersecting(zordered, LO, HI)
    assert lin_hit == lin_total == N_FILES  # zero file-level prunability
    assert z_hit <= z_total // 2, (z_hit, z_total)

    # witness 2: the executed scan. Row-group stats let the parquet reader
    # skip whole groups, so the z-ordered scan surfaces a fraction of the
    # rows the linear scan does for the same predicate.
    pred = (F.col("k2") >= LO) & (F.col("k2") <= HI)
    lin_files, lin_rows = _scan_rows(spark.read.parquet(linear).filter(pred))
    z_files, z_rows = _scan_rows(spark.read.parquet(zordered).filter(pred))
    assert lin_rows == N  # linear layout reads everything
    assert z_rows <= N // 2, (z_rows, N)
    # and the result itself is identical either way
    assert (
        spark.read.parquet(zordered).filter(pred).count()
        == spark.read.parquet(linear).filter(pred).count()
    )
