"""Parquet source/sink — the engine's native table format.

The reference ships Delta/Parquet-capable jars but moves CSV between zones
(SURVEY.md §2.1, "latent connector capability"). This engine stores zone
tables as Parquet: columnar scan, predicate pushdown, column pruning and
partition pruning all engage, which is the difference between reading 100 TB
and reading the 2 columns × 3 partitions a query actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing its nanosecond timestamps.

    The driver's events parquet stores ``ts`` as INT64 TIMESTAMP(NANOS),
    which Spark's parquet reader rejects outright. Reading with
    ``spark.sql.legacy.parquet.nanosAsLong`` surfaces the raw nanos as a
    long; ``ts div 1000`` (integer division — a double division would lose
    precision above 2^53 ns) truncates to whole microseconds, exactly how
    DuckDB's TIMESTAMP reads the same file. The driver data is whole-micro
    anyway, so the conversion is lossless.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.select(
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def events_long_ts_schema(spark: SparkSession, sf_dir: str):
    """The nanosAsLong schema of the events parquet (ts: long) — what a
    streaming file source over the events zone must declare."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """nanos-long ``ts`` → microsecond timestamp (streaming-safe projection)."""
    from pyspark.sql import functions as F

    return df.select(
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a Parquet table, optionally hive-partitioned.

    ``partition_by`` should be low-cardinality columns used in filters
    (e.g. a date column at 100 TB) so downstream scans partition-prune.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver testdata tables (TESTDATA.md) and register temp views.

    Returns {name: DataFrame}; each is also available to ``spark.sql`` as a
    temp view of the same name.
    """
    from cyrela_etl_spark.schemas import TESTDATA_TABLES

    out: dict[str, DataFrame] = {}
    for name in tables or TESTDATA_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
