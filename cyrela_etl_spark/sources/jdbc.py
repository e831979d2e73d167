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
