from __future__ import annotations

import pytest

from cyrela_etl_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cyrela-etl-spark-tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
