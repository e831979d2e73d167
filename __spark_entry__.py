"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the registry ``cyrela_etl_spark/queries/`` — one
(spark_fn, oracle_sql) pair per implemented operator from SURVEY.md §2
plus the LLM-pipeline extension operators (dedup / similarity / text /
temporal / multimodal / streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cyrela_etl_spark.queries import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the multiway star join + decimal-exact revenue
    rollup (q05) over the sf0.001 tables — exercises scan, broadcast +
    shuffle joins, hash agg, and the exact-money determinism contract."""
    from cyrela_etl_spark.queries.relational import q05_region_revenue

    return q05_region_revenue(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions).

    Every callable takes (spark, sf_dir) and returns a DataFrame whose
    column names/types match its ``oracle_sql`` twin exactly.
    """
    return {name: fn for name, (fn, _oracle) in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for ops
    that are genuinely non-SQL-expressible; the registry currently has an
    oracle for every entry)."""
    return {name: oracle for name, (_fn, oracle) in load_all().items() if oracle is not None}
