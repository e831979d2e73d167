"""Date helpers (reference F9, dags/s3-etl-wallet-csv.py:53-55)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def reformat_date(col: Column | str, in_fmt: str = "dd/MM/yyyy", out_fmt: str = "yyyy-MM-dd") -> Column:
    """Reformat a date string between patterns; null/unparseable → null.

    Native replacement for the reference's row-at-a-time
    ``datetime.strptime(...).strftime(...)`` with isinstance null-guard —
    stays inside whole-stage codegen instead of a Python UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.to_date(c, in_fmt), out_fmt)
