"""Round-7 storage/stats wave: schema evolution, integrity checksums,
exact-moment correlation. Registry entries are oracle-checked; these
tests pin what the oracle can't see: the checksum actually DETECTING a
single-row corruption, evolution surfacing NULLs (not defaults), and the
correlation matching a trusted reference implementation on a hand-built
frame.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# storage_integrity_checksum
# ---------------------------------------------------------------------------
def test_checksum_detects_single_row_change(spark, tmp_path):
    """Flipping one value in one row must change exactly that group's
    xor digest and leave every other group's digest intact."""
    from cyrela_etl_spark.queries.storageq import storage_integrity_checksum

    base = storage_integrity_checksum(spark, SF).toPandas().set_index("o_orderstatus")

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    victim = orders.limit(1).collect()[0]
    mutated = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == victim["o_orderkey"], F.col("o_totalprice") + 0.01)
        .otherwise(F.col("o_totalprice")),
    )
    mutated.write.parquet(str(tmp_path / "orders.parquet"))

    mut = storage_integrity_checksum(spark, str(tmp_path)).toPandas()
    mut = mut.set_index("o_orderstatus")

    changed = [
        s for s in base.index if base.loc[s, "xor_digest"] != mut.loc[s, "xor_digest"]
    ]
    assert changed == [victim["o_orderstatus"]]
    # counts and key ranges are untouched by a value flip
    assert (base["n_rows"] == mut["n_rows"]).all()
    assert (base["min_key"] == mut["min_key"]).all()


def test_checksum_is_order_insensitive(spark):
    """The digest must not depend on partitioning/arrival order — the
    property that makes it usable for cross-replica reconciliation."""
    from cyrela_etl_spark.queries.storageq import storage_integrity_checksum

    a = storage_integrity_checksum(spark, SF).toPandas().sort_values("o_orderstatus")

    from cyrela_etl_spark.functions.hashing import hex_prefix_long

    orders = spark.read.parquet(f"{SF}/orders.parquet").repartition(7, "o_custkey")
    row_repr = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.col("o_orderpriority"),
    )
    b = (
        orders.select("o_orderstatus", hex_prefix_long(row_repr).alias("h"))
        .groupBy("o_orderstatus")
        .agg(F.bit_xor("h").alias("xor_digest"))
        .toPandas()
        .sort_values("o_orderstatus")
    )
    assert list(a["xor_digest"]) == list(b["xor_digest"])


def test_checksum_plan_has_no_joins(spark):
    plan = _plan(
        __import__(
            "cyrela_etl_spark.queries.storageq", fromlist=["storage_integrity_checksum"]
        ).storage_integrity_checksum(spark, SF)
    )
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# storage_schema_evolution
# ---------------------------------------------------------------------------
def test_schema_evolution_nulls_not_defaults(spark):
    """Pre-evolution rows must surface the evolved column as NULL; the
    '<pre-evolution>' group must therefore hold exactly the even keys."""
    from cyrela_etl_spark.queries.storageq import storage_schema_evolution

    out = storage_schema_evolution(spark, SF).toPandas().set_index("priority")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_even = orders.filter(F.col("o_orderkey") % 2 == 0).count()
    n_all = orders.count()
    assert int(out.loc["<pre-evolution>", "n_orders"]) == n_even
    assert int(out["n_orders"].sum()) == n_all


# ---------------------------------------------------------------------------
# storage_correlation_profile
# ---------------------------------------------------------------------------
def test_correlation_matches_numpy_reference(spark):
    """The exact-moment formula must agree with numpy's corrcoef to well
    inside the 6-digit defensive round."""
    import numpy as np
    import pandas as pd

    from cyrela_etl_spark.queries.storageq import storage_correlation_profile

    out = storage_correlation_profile(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_quantity", "l_extendedprice", "l_discount"]
    ]
    for _, row in out.iterrows():
        ref = np.corrcoef(li[row["col_x"]], li[row["col_y"]])[0, 1]
        assert math.isfinite(row["pearson_corr"])
        assert abs(row["pearson_corr"] - ref) < 1e-6, (row["col_x"], row["col_y"])
        assert -1.0 <= row["pearson_corr"] <= 1.0


def test_correlation_single_scan_no_joins(spark):
    from cyrela_etl_spark.queries.storageq import storage_correlation_profile

    df = storage_correlation_profile(spark, SF)
    plan = _plan(df)
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_orc_scan_pushes_predicates(spark, tmp_path):
    """ORC scans must carry pushed filters and a pruned ReadSchema —
    format coverage is only real if the optimizer reaches the reader."""
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    path = f"{tmp_path}/li_orc"
    li.write.orc(path)
    q = (
        spark.read.orc(path)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_returnflag" in plan
    assert "l_quantity" not in plan.split("ReadSchema")[1][:200]


def test_csv_dialect_hostile_payload_roundtrip(spark, tmp_path):
    """Quoted CSV with embedded delimiter, quote, AND newline must
    round-trip byte-identically under the RFC-4180 dialect (escape='\"'
    on BOTH legs — the writer's backslash default silently splits
    payload rows)."""
    payload = 'x,"quoted"\nsecond line,3'
    df = spark.createDataFrame([(1, payload)], "k long, payload string")
    path = f"{tmp_path}/hostile"
    df.write.option("header", True).option("quoteAll", True).option("escape", '"').csv(path)
    back = (
        spark.read.schema(df.schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    rows = back.collect()
    assert len(rows) == 1
    assert rows[0]["payload"] == payload
