"""Declared schemas: the wallet table and the driver star-schema tables.

Wallet schema mirrors the reference's explicit 23-column StructType
(reference spark/jobs/pr-wallet-data-tf.py:34-57): integer codes, double
money columns, and date columns kept as *strings* — the reference relies on
implicit string→date casts inside DAY()/MONTH()/YEAR(), and golden-output
equality depends on reproducing that.
"""

from __future__ import annotations

from pyspark.sql import types as T

WALLET_COLUMNS: list[str] = [
    "empresa",
    "marca",
    "empreendimento",
    "cliente",
    "regional",
    "obra",
    "bloco",
    "unidade",
    "dt_venda",
    "dt_chaves",
    "carteira_sd_gerencial",
    "saldo_devedor",
    "data_base",
    "total_atraso",
    "faixa_de_atraso",
    "dias_atraso",
    "valor_pago_atualizado",
    "valor_pago",
    "status",
    "dt_reneg",
    "descosn",
    "vaga",
    "vgv",
]

# Columns holding dd/MM/yyyy dates in the raw zone, ISO yyyy-MM-dd once
# curated (reference dags/s3-etl-wallet-csv.py:53-55,105-106).
WALLET_DATE_COLUMNS: list[str] = ["dt_venda", "dt_chaves", "data_base", "dt_reneg"]


def wallet_schema() -> T.StructType:
    """23-column wallet schema (reference spark/jobs/pr-wallet-data-tf.py:34-57)."""
    return (
        T.StructType()
        .add("empresa", T.IntegerType(), True)
        .add("marca", T.StringType(), True)
        .add("empreendimento", T.StringType(), True)
        .add("cliente", T.StringType(), True)
        .add("regional", T.StringType(), True)
        .add("obra", T.IntegerType(), True)
        .add("bloco", T.IntegerType(), True)
        .add("unidade", T.IntegerType(), True)
        .add("dt_venda", T.StringType(), True)
        .add("dt_chaves", T.StringType(), True)
        .add("carteira_sd_gerencial", T.IntegerType(), True)
        .add("saldo_devedor", T.DoubleType(), True)
        .add("data_base", T.StringType(), True)
        .add("total_atraso", T.DoubleType(), True)
        .add("faixa_de_atraso", T.IntegerType(), True)
        .add("dias_atraso", T.IntegerType(), True)
        .add("valor_pago_atualizado", T.DoubleType(), True)
        .add("valor_pago", T.DoubleType(), True)
        .add("status", T.StringType(), True)
        .add("dt_reneg", T.StringType(), True)
        .add("descosn", T.StringType(), True)
        .add("vaga", T.StringType(), True)
        .add("vgv", T.DoubleType(), True)
    )


# The 34-column output contract of the feature query, in order
# (matches the reference golden data/parsed-data.csv header).
WALLET_FEATURE_COLUMNS: list[str] = [
    "empresa",
    "p_empresa",
    "marca",
    "p_marca",
    "obra",
    "p_obra",
    "bloco",
    "p_bloco",
    "unidade",
    "p_unidade",
    "dt_venda",
    "p_dt_venda_day",
    "p_dt_venda_month",
    "p_dt_venda_year",
    "dt_chaves",
    "p_dt_chaves_day",
    "p_dt_chaves_month",
    "p_dt_chaves_year",
    "carteira_sd_gerencial",
    "p_carteira_sd_gerencial",
    "saldo_devedor",
    "p_saldo_devedor",
    "p_data_base_day",
    "p_data_base_month",
    "p_data_base_year",
    "dias_atraso",
    "p_dias_atraso",
    "p_dias_atraso_category",
    "valor_pago_atualizado",
    "p_valor_pago_atualizado",
    "valor_pago",
    "p_valor_pago",
    "vgv",
    "p_vgv",
]

# Driver-provided star-schema + extension tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES: list[str] = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
