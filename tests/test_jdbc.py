"""JDBC warehouse sink (S6) + DDL pre-action (S7), exercised for real
against embedded Derby — the pure-Java database that ships in Spark's own
classpath — so the driver-manager pre-action, the distributed append and
the read-back all open actual JDBC connections (reference
dags/s3-etl-wallet-csv.py:120-135,204-236)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cyrela_etl_spark.sources.jdbc import write_jdbc


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_jdbc_ddl_preaction_and_append(spark, tmp_path):
    url = _derby_url(tmp_path, "wh")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_jdbc(
        df,
        url,
        "features",
        mode="append",
        batchsize=16,
        num_partitions=4,
        create_table_ddl="CREATE TABLE features (k BIGINT, v BIGINT)",
    )
    back = spark.read.jdbc(url, "features")
    got = sorted((r[0], r[1]) for r in back.collect())
    assert got == [(i, 2 * i) for i in range(100)]


def test_jdbc_append_accumulates(spark, tmp_path):
    """Second append (no DDL — table exists) must add rows, mirroring the
    reference's per-run append into the warehouse table."""
    url = _derby_url(tmp_path, "wh2")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    write_jdbc(df, url, "t_acc", create_table_ddl="CREATE TABLE t_acc (k BIGINT)")
    write_jdbc(df, url, "t_acc")
    assert spark.read.jdbc(url, "t_acc").count() == 20


def test_wallet_serving_ddl_postgres_matches_reference(spark):
    """The generated Postgres DDL must reproduce the reference's serving
    table (dags/s3-etl-wallet-csv.py:207-235) column for column: SERIAL
    surrogate PK, VARCHAR for descriptive AND integer-coded columns,
    NUMERIC for the five money columns, DATE for the three true date
    columns — with dt_reneg staying VARCHAR (its raw values include '-')."""
    from cyrela_etl_spark.sources.jdbc import wallet_serving_ddl, wallet_serving_types

    ddl = wallet_serving_ddl("postgres")
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS wallet")
    assert "id SERIAL PRIMARY KEY" in ddl
    types = wallet_serving_types()
    assert {c for c, t in types.items() if t == "numeric"} == {
        "saldo_devedor", "total_atraso", "valor_pago_atualizado", "valor_pago", "vgv",
    }
    assert {c for c, t in types.items() if t == "date"} == {
        "dt_venda", "dt_chaves", "data_base",
    }
    assert types["dt_reneg"] == "text"
    assert types["empresa"] == "text"  # integer-coded dim served as text
    for col, t in types.items():
        expected = {"text": "VARCHAR", "numeric": "NUMERIC", "date": "DATE"}[t]
        assert f"{col} {expected} NULL" in ddl
    # 23 data columns + the surrogate key
    assert ddl.count(" NULL") == 23


def test_wallet_serving_ddl_unknown_dialect_and_type():
    import pytest

    from cyrela_etl_spark.sources.jdbc import serving_ddl

    with pytest.raises(ValueError, match="unknown dialect"):
        serving_ddl("t", {"a": "text"}, dialect="oracle")
    with pytest.raises(ValueError, match="unknown logical types"):
        serving_ddl("t", {"a": "blob"}, dialect="postgres")


def test_wallet_serving_ddl_derby_e2e(spark, tmp_path):
    """The Derby rendering of the SAME logical serving schema must be
    executable DDL that the distributed writer can append into — identity
    column auto-assigned, dates as real DATEs, money landing in NUMERIC."""
    import datetime

    from cyrela_etl_spark.sources.jdbc import wallet_serving_ddl

    url = _derby_url(tmp_path, "whserve")
    ddl = wallet_serving_ddl("derby", table="wallet")
    assert "GENERATED ALWAYS AS IDENTITY PRIMARY KEY" in ddl
    rows = [
        (1, "marca-a", datetime.date(2020, 1, 5), 1234.56),
        (2, "marca-b", datetime.date(2021, 7, 9), 99.10),
    ]
    df = spark.createDataFrame(
        rows, "empresa int, marca string, dt_venda date, saldo_devedor double"
    ).select(
        F.col("empresa").cast("string"),  # serving contract: codes as text
        "marca",
        "dt_venda",
        "saldo_devedor",
    )
    write_jdbc(df, url, "wallet", create_table_ddl=ddl, num_partitions=2)
    back = spark.read.jdbc(url, "wallet")
    # Derby uppercases unquoted identifiers
    assert back.where("ID IS NOT NULL").count() == 2  # identity assigned
    got = sorted((r["EMPRESA"], str(r["DT_VENDA"]), float(r["SALDO_DEVEDOR"])) for r in back.collect())
    assert got == [("1", "2020-01-05", 1234.56), ("2", "2021-07-09", 99.1)]


def test_jdbc_partitioned_read_parallel_and_complete(spark, tmp_path):
    """Partitioned read: N strided connections reconstruct exactly the
    written table (including rows OUTSIDE the bounds — bounds split, they
    don't filter), and the scan genuinely has N partitions."""
    from cyrela_etl_spark.sources.jdbc import read_jdbc_partitioned

    url = _derby_url(tmp_path, "wh3")
    df = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    write_jdbc(df, url, "t_part", create_table_ddl="CREATE TABLE t_part (k BIGINT, v BIGINT)")
    back = read_jdbc_partitioned(
        spark, url, "t_part", partition_column="k",
        lower_bound=100, upper_bound=900, num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000  # bounds split the scan, nothing dropped
    # Derby uppercases unquoted identifiers; address positionally
    assert sorted(r[0] for r in back.collect()) == list(range(1000))
