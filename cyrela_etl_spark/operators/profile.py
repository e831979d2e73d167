"""Data profiling + statistical monitoring — the observe()/ANALYZE side
of a lakehouse pipeline, as oracle-checkable operators.

`numeric_profile` is the per-column stats pass every warehouse runs
before choosing join strategies or flagging drift (ANALYZE TABLE /
dbt-style column profiles). `zscore_anomalies` is the standard
monitoring primitive: flag events whose value deviates > z·σ from the
key's mean.

Determinism: counts and distincts are exact ints; sums go through
DECIMAL (associative-exact) and every derived moment is a fixed chain of
IEEE ops over those exact endpoints — bit-reproducible against any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled numeric column: n_rows, n_nulls, n_distinct
    (exact), min/max as double.

    ONE aggregate pass computes every column's stats simultaneously (a
    single scan regardless of column count — per-column passes would scan
    the table len(cols) times); the wide 1-row result is then unpivoted
    driver-side into (column, stat...) rows. The unpivot touches a 1-row
    frame, so this stays a single job + a metadata-sized reshape.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def zscore_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    z: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Rows whose value deviates more than ``z`` standard deviations from
    their key's mean — the monitoring/outlier primitive.

    Moments come from exact DECIMAL sums: mean = S/n, sample variance =
    (n·Q − S²)/(n·(n−1)) with S = Σvalue, Q = Σvalue² both carried as
    decimals and cast to double once — so mean/σ are a short fixed chain
    of IEEE ops over identical endpoints on every engine, and the z-score
    (rounded before thresholding) is hash-stable.

    Plan: one hash agg to per-key moments (keys are low-cardinality by
    contract — event types, sensors), broadcast back over the scan, flag
    in a projection. Output is sized to the anomalies, not the input.
    """
    dec = F.col(value_col).cast("decimal(12,2)")
    stats = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(dec).cast("double").alias("__s"),
        F.sum(dec * dec).cast("double").alias("__q"),
    )
    n, s, q = F.col("__n"), F.col("__s"), F.col("__q")
    stats = stats.select(
        key_col,
        "__n",
        (s / n).alias("__mean"),
        F.sqrt((n * q - s * s) / (n * (n - 1))).alias("__std"),
    )
    joined = df.join(F.broadcast(stats), key_col)
    zscore = F.round((F.col(value_col) - F.col("__mean")) / F.col("__std"), round_digits)
    return (
        joined.select(
            F.col(id_col),
            F.col(key_col),
            F.col(value_col),
            F.round(F.col("__mean"), round_digits).alias("key_mean"),
            zscore.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > F.lit(z))
    )
