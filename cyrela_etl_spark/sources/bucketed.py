"""Bucketed table storage: pre-shuffled layout for co-located joins.

At 100 TB the recurring fact-fact join (orders ⋈ lineitem on orderkey)
pays a full shuffle of both sides every query. Bucketing writes each table
hash-partitioned by the join key into a fixed number of buckets ONCE; a
join of two tables bucketed by the same key into the same bucket count
then runs with ZERO exchanges (verified in tests by asserting no
``Exchange hashpartitioning`` in the physical plan). ``sortBy`` inside
buckets additionally removes the sort from sort-merge joins.

Spark requires ``saveAsTable`` for bucketed writes (bucket metadata lives
in the catalog); with ``path`` set the table is external — data stays in
the zone directory, the catalog only carries layout metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    buckets: int = 8,
    path: str | None = None,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as a bucketed parquet table; returns the catalog-backed
    DataFrame whose scans carry the bucket layout."""
    spark = df.sparkSession
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, bucket_key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
