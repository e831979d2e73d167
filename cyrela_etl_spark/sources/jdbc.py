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


# ---------------------------------------------------------------------------
# Serving-table DDL generation (reference dags/s3-etl-wallet-csv.py:207-235).
#
# The reference hand-writes one Postgres CREATE TABLE for the wallet serving
# table: a SERIAL surrogate key, VARCHAR for every descriptive/code column,
# NUMERIC for money, DATE for the three true date columns (dt_reneg stays
# VARCHAR — its raw values include '-'). Here the same statement is GENERATED
# from the declared wallet schema through a dialect table, so the engine can
# emit the identical DDL for Postgres and a runnable equivalent for any
# JDBC warehouse the tests can reach (embedded Derby).
# ---------------------------------------------------------------------------

# Logical serving types → per-dialect SQL renderings. "identity" is the
# auto-increment surrogate-key column including its PRIMARY KEY clause.
SQL_DIALECTS: dict[str, dict[str, str]] = {
    "postgres": {
        "create": "CREATE TABLE IF NOT EXISTS",
        "identity": "SERIAL PRIMARY KEY",
        "text": "VARCHAR",
        "numeric": "NUMERIC",
        "date": "DATE",
        # explicit NULL marker, matching the reference DDL's spelling
        "null": " NULL",
    },
    # Derby has no SERIAL, no IF NOT EXISTS (an existing table raises
    # SQLState X0Y32 — callers treat that as "already provisioned"), no
    # explicit NULL column constraint (nullable is the default and the
    # keyword is a syntax error), and requires VARCHAR lengths; NUMERIC
    # defaults to (5,0) so money gets an explicit precision/scale.
    "derby": {
        "create": "CREATE TABLE",
        "identity": "INTEGER NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY",
        "text": "VARCHAR(512)",
        "numeric": "NUMERIC(20,2)",
        "date": "DATE",
        "null": "",
    },
}


def serving_ddl(
    table: str,
    column_types: dict[str, str],
    dialect: str = "postgres",
    id_column: str | None = "id",
) -> str:
    """CREATE TABLE IF NOT EXISTS for a serving table from logical column
    types ('text' | 'numeric' | 'date'), rendered for ``dialect``.

    Data columns are NULLable (the reference's serving contract — the lake
    is the system of record; the warehouse copy tolerates gaps). The
    identifiers are emitted unquoted on purpose: Spark's JDBC writer
    resolves DataFrame column names against the live table schema
    case-insensitively, so unquoted DDL composes with ``write_jdbc`` on
    case-folding engines (Derby uppercases unquoted identifiers).
    """
    if dialect not in SQL_DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; have {sorted(SQL_DIALECTS)}")
    d = SQL_DIALECTS[dialect]
    unknown = {t for t in column_types.values() if t not in ("text", "numeric", "date")}
    if unknown:
        raise ValueError(f"unknown logical types {sorted(unknown)}; have text|numeric|date")
    lines = []
    if id_column:
        lines.append(f"{id_column} {d['identity']}")
    lines.extend(f"{c} {d[t]}{d['null']}" for c, t in column_types.items())
    cols = ",\n  ".join(lines)
    return f"{d['create']} {table} (\n  {cols}\n)"


def wallet_serving_types() -> dict[str, str]:
    """Logical serving type per wallet column, derived from the declared
    schema rather than hand-listed: the DoubleType money columns map to
    'numeric', the curated date columns (minus dt_reneg, which the raw
    feed pollutes with '-') to 'date', everything else — including the
    integer-coded dimensions, which the reference serves as text — to
    'text'. Reproduces reference dags/s3-etl-wallet-csv.py:207-235
    column for column."""
    from pyspark.sql import types as T

    from cyrela_etl_spark.schemas import WALLET_DATE_COLUMNS, wallet_schema

    money = {f.name for f in wallet_schema().fields if isinstance(f.dataType, T.DoubleType)}
    dates = set(WALLET_DATE_COLUMNS) - {"dt_reneg"}
    return {
        f.name: "numeric" if f.name in money else "date" if f.name in dates else "text"
        for f in wallet_schema().fields
    }


def wallet_serving_ddl(dialect: str = "postgres", table: str = "wallet") -> str:
    """The reference's wallet serving DDL, generated for ``dialect``."""
    return serving_ddl(table, wallet_serving_types(), dialect)


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
