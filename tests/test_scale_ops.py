"""Scale-technique operators: salted join equivalence and bucketed-join
shuffle elimination (the plan property IS the feature)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cyrela_etl_spark.operators.skew import salted_agg, salted_join
from cyrela_etl_spark.sources.bucketed import write_bucketed


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    plain = li.join(orders.withColumnRenamed("l_orderkey", "k"), F.col("l_orderkey") == F.col("k")).drop("k")
    salted = salted_join(li, orders, on=["l_orderkey"], salts=5, salt_on="l_linenumber")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("o_totalprice").alias("mx"),
        F.min("o_totalprice").alias("mn"),
    )
    salted = salted_agg(
        orders,
        keys=["o_orderstatus"],
        aggs={
            "n": F.count(F.lit(1)),
            "mx": F.max("o_totalprice"),
            "mn": F.min("o_totalprice"),
        },
        salts=7,
        salt_on="o_orderkey",
    )
    assert _rows(salted.select("o_orderstatus", "n", "mx", "mn")) == _rows(plain)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_orderstatus")
    bli = write_bucketed(li, "t_b_li", "l_orderkey", buckets=4, path=str(tmp_path / "li"))
    bo = write_bucketed(orders, "t_b_o", "o_orderkey", buckets=4, path=str(tmp_path / "o"))
    joined = bli.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    # and the join still produces the full result
    assert joined.count() == li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
