"""JSON-lines source/sink — the interchange format every scraped/API
corpus arrives in (the reference moves CSV only; JSONL is the equivalent
surface for semi-structured feeds).

Same engine contract as CSV (sources/csv.py): explicit schema always —
schema inference re-scans the data and types drift run-to-run; a 100 TB
feed cannot afford either. Malformed-line policy is explicit:

- ``PERMISSIVE`` (default): a bad line yields a row of nulls (optionally
  captured in ``corrupt_col``) — the pipeline counts and quarantines.
- ``DROPMALFORMED`` / ``FAILFAST``: Spark's other two contracts, passed
  through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, splittable and append-friendly."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    parse_mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Explicit-schema JSONL read with a named malformed-line policy.

    With ``corrupt_col`` set (PERMISSIVE only) the raw text of each bad
    line lands in that column — add it to the schema downstream writes a
    quarantine zone from; without it, bad lines are all-null rows the
    caller counts.
    """
    reader = spark.read.format("json").option("mode", parse_mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).load(path)
