"""Wallet e2e at the reference's PRODUCTION row count (VERDICT r8 item 7):
the reference DAG documents ~2 M rows/day through this pipeline
(reference dags/s3-etl-wallet-csv.py:238-239) while the golden test runs
2,998. This test drives the full chain — CSV ingest → 34-col feature
projection → JDBC (Derby) warehouse load — at 2,000,000 synthetic rows,
asserting the single-pass plan shape and recording wall-time bounds
(measured on this host: ~2 s pipeline, ~75 s Derby load; NOTES.md).

Marked slow: ~90 s of the suite's budget, the price of one
production-scale end-to-end proof.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cyrela_etl_spark.operators.wallet import wallet_pipeline
from cyrela_etl_spark.schemas import WALLET_FEATURE_COLUMNS
from cyrela_etl_spark.sources import read_wallet_csv
from cyrela_etl_spark.sources.jdbc import write_jdbc

N_ROWS = 2_000_000


def _synthetic_wallet(spark, n: int):
    """23-column wallet relation synthesized distributedly (spark.range —
    no driver-side rows), value ranges shaped like the reference corpus:
    dd/MM/yyyy date strings, negative delinquency days, monetary doubles."""
    brand = F.element_at(
        F.array(F.lit("Cyrela"), F.lit("Living"), F.lit("Vivaz"), F.lit("Other")),
        (F.col("id") % 4 + 1).cast("int"),
    )
    return spark.range(n).select(
        (F.col("id") % 97 + 1).cast("int").alias("empresa"),
        brand.alias("marca"),
        F.concat(F.lit("emp"), (F.col("id") % 50).cast("string")).alias("empreendimento"),
        F.concat(F.lit("cli"), F.col("id").cast("string")).alias("cliente"),
        F.lit("SP").alias("regional"),
        (F.col("id") % 211 + 1).cast("int").alias("obra"),
        (F.col("id") % 17 + 1).cast("int").alias("bloco"),
        (F.col("id") % 401 + 1).cast("int").alias("unidade"),
        F.date_format(
            F.date_add(F.lit("2015-01-01"), (F.col("id") % 3000).cast("int")), "dd/MM/yyyy"
        ).alias("dt_venda"),
        F.date_format(
            F.date_add(F.lit("2017-01-01"), (F.col("id") % 3000).cast("int")), "dd/MM/yyyy"
        ).alias("dt_chaves"),
        (F.col("id") % 100000).cast("int").alias("carteira_sd_gerencial"),
        ((F.col("id") % 1000000) / 7.0).alias("saldo_devedor"),
        F.date_format(
            F.date_add(F.lit("2020-01-01"), (F.col("id") % 365).cast("int")), "dd/MM/yyyy"
        ).alias("data_base"),
        ((F.col("id") % 90000) / 11.0).alias("total_atraso"),
        (F.col("id") % 6).cast("int").alias("faixa_de_atraso"),
        (-(F.col("id") % 400)).cast("int").alias("dias_atraso"),
        ((F.col("id") % 800000) / 13.0).alias("valor_pago_atualizado"),
        ((F.col("id") % 700000) / 17.0).alias("valor_pago"),
        F.lit("ATIVO").alias("status"),
        F.lit("").alias("dt_reneg"),
        F.lit("").alias("descosn"),
        F.lit("").alias("vaga"),
        ((F.col("id") % 2000000) / 3.0).alias("vgv"),
    )


@pytest.mark.slow
def test_wallet_pipeline_and_jdbc_load_at_2m_rows(spark, tmp_path):
    # landing: 2 M rows as header'd CSV, the reference's ingest format
    _synthetic_wallet(spark, N_ROWS).repartition(8).write.options(header="true").mode(
        "overwrite"
    ).csv(str(tmp_path / "raw"))

    raw = read_wallet_csv(spark, str(tmp_path / "raw"))
    feats = wallet_pipeline(raw)

    # single-pass plan shape: the 9 maxima ride ONE extra aggregation
    # scan folded into a 1-row broadcast (BNLJ) — exactly 2 scans of the
    # input total, vs the reference's ~10 per-feature rescans
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan csv") == 2
    assert plan.count("BroadcastNestedLoopJoin") == 1

    t0 = time.monotonic()
    n = feats.count()
    pipeline_wall = time.monotonic() - t0
    assert n == N_ROWS
    assert feats.columns == WALLET_FEATURE_COLUMNS
    # measured ~2 s on local[32]; 60 s bound absorbs CI load swings
    assert pipeline_wall < 60, f"feature pass took {pipeline_wall:.1f}s at 2M rows"

    url = f"jdbc:derby:{tmp_path}/wh;create=true"
    t1 = time.monotonic()
    write_jdbc(feats, url, "wallet_serving", batchsize=20000, num_partitions=4)
    jdbc_wall = time.monotonic() - t1
    assert spark.read.jdbc(url, "wallet_serving").count() == N_ROWS
    # measured ~75 s (embedded Derby, single disk); bound leaves headroom
    assert jdbc_wall < 300, f"Derby load took {jdbc_wall:.1f}s at 2M rows"
