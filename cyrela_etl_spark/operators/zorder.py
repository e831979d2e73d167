"""Z-order (Morton-curve) clustering — the lakehouse data-layout
maintenance op (Delta OPTIMIZE ZORDER BY, Hudi/Iceberg sort-order
rewrite), spelled in plain Spark.

Why it matters at 100 TB: min/max zone maps (parquet footer stats) prune
file scans only when each file covers a NARROW range of the filter
column. Sorting by one column gives perfect pruning on it and none on a
second; interleaving the bits of both keys makes every file a small
rectangle in (k1, k2) space, so filters on EITHER column skip most files.

The z-value is pure integer bit arithmetic (shifts/and/or) — JVM-side,
codegen, and bit-identical in any engine, so the clustering assignment is
oracle-checkable. The physical rewrite is ``repartitionByRange`` on the
z-value (range partitioner → contiguous z-runs per output file) +
``sortWithinPartitions`` so footer stats are tight inside each file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_expr(d1: Column, d2: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of d1 →
    position 2i, bit i of d2 → 2i+1 (Morton code, public construction).
    2·bits ≤ 62 keeps everything in long range."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftrightunsigned(d1, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftrightunsigned(d2, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def zvalue_sql(d1: str, d2: str, bits: int = 16) -> str:
    """The identical interleave as portable SQL text (DuckDB / ANSI with
    >> << & operators) — the oracle twin of ``zvalue_expr``."""
    terms = []
    for i in range(bits):
        terms.append(f"((({d1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({d2} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_keys(df: DataFrame, k1: str, k2: str, bits: int = 16) -> DataFrame:
    """df + ``zvalue`` column from the low ``bits`` of two integer keys
    (callers pre-reduce non-integer keys: mod a power of two, day-number
    a date, hash a string).

    Precondition for good locality: the two keys should occupy SIMILAR bit
    widths — if one key's dynamic range is much wider, its high bits
    dominate the curve and the narrow key gets no clustering (Delta's
    OPTIMIZE ZORDER range-normalizes every column to equal-width range
    ids first for exactly this reason; do the same upstream — e.g. scale
    each key to its rank percentile × 2^bits — when ranges differ)."""
    return df.withColumn(
        "zvalue", zvalue_expr(F.col(k1).cast("long"), F.col(k2).cast("long"), bits)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    k1: str,
    k2: str,
    bits: int = 16,
    n_files: int = 64,
) -> None:
    """The physical rewrite: range-partition on zvalue (contiguous Morton
    runs per file) + in-file sort (tight footer min/max), then parquet.
    This is OPTIMIZE ZORDER for a parquet zone."""
    zorder_keys(df, k1, k2, bits).repartitionByRange(
        n_files, "zvalue"
    ).sortWithinPartitions("zvalue").write.mode("overwrite").parquet(path)


def zorder_cluster_stats(
    df: DataFrame, k1: str, k2: str, bits: int = 16, bucket_shift: int = 22
) -> DataFrame:
    """Per z-bucket locality report: row count and the min/max rectangle of
    both keys inside each bucket (bucket = zvalue >> bucket_shift — the
    file-grain a range-partitioned write would produce). Narrow rectangles
    = effective zone-map pruning on either key; the measurable contract of
    z-ordering, and the quantity a lakehouse OPTIMIZE job reports.

    One hash agg on the bucket key; everything integer-exact.
    """
    z = zorder_keys(df, k1, k2, bits)
    return (
        z.groupBy(
            F.shiftrightunsigned(F.col("zvalue"), bucket_shift)
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("zvalue").alias("min_z"),
            F.max("zvalue").alias("max_z"),
            F.min(F.col(k1).cast("long")).alias("min_k1"),
            F.max(F.col(k1).cast("long")).alias("max_k1"),
            F.min(F.col(k2).cast("long")).alias("min_k2"),
            F.max(F.col(k2).cast("long")).alias("max_k2"),
        )
    )
