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
