"""JDBC warehouse sink (reference operators S6/S7 in SURVEY.md §2.1).

Replaces the reference's driver-side SQLAlchemy ``to_sql(chunksize=10)``
append (reference dags/s3-etl-wallet-csv.py:128-135) — single-threaded,
10-row INSERTs, its biggest performance smell at the stated ~2M rows — with
Spark's distributed JDBC writer: ``numPartitions`` parallel connections,
``batchsize`` rows per round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
    create_table_ddl: str | None = None,
) -> None:
    """Append a DataFrame into a warehouse table over JDBC.

    ``create_table_ddl`` mirrors the reference's CREATE TABLE IF NOT EXISTS
    pre-action (reference dags/s3-etl-wallet-csv.py:204-236); it is executed
    via a driver-side connection before the distributed write.
    """
    props = dict(properties or {})
    props.setdefault("batchsize", str(batchsize))
    if create_table_ddl is not None:
        # Pre-action on one JVM-side connection, with the SAME credential
        # properties the distributed writer uses (user/password/etc. from
        # ``properties``) — a bare getConnection(url) would fail against
        # any authenticated warehouse. Exercised end-to-end against
        # embedded Derby (ships with Spark) in tests/test_jdbc.py.
        jvm = df.sparkSession._sc._jvm
        jprops = jvm.java.util.Properties()
        for k, v in props.items():
            jprops.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
        try:
            conn.createStatement().execute(create_table_ddl)
        finally:
            conn.close()
    writer = df
    if num_partitions is not None:
        writer = df.repartition(num_partitions)
    writer.write.jdbc(url=url, table=table, mode=mode, properties=props)


def read_jdbc_partitioned(
    spark,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """PARALLEL warehouse read — the read-side twin of ``write_jdbc`` and
    the shape a warehouse→lake backfill needs at scale: ``num_partitions``
    executors each open a connection scoped to a stride of
    ``partition_column`` (Spark generates the WHERE ranges), instead of
    one connection dragging the whole table through the driver.

    ``partition_column`` must be an indexed numeric/date column with
    roughly uniform distribution between the bounds — a skewed column
    concentrates rows in one stride and serializes the read again (same
    hot-key discipline as any shuffle). Bounds don't FILTER (rows outside
    land in the edge partitions); they only split.
    """
    return spark.read.jdbc(
        url,
        table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=properties or {},
    )
