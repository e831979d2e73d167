"""The registry cache contract, made actionable for embedders.

Library operators persist plan-backing intermediates that only the CALLER
can release (see the contract note in queries/__init__ and the
``# release:`` markers at each persist site). ``released_cache`` is the
one-liner that makes a long-lived session honor the contract: consume
the query results inside the scope; every DataFrame cache created by the
work is dropped on exit — the same ``spark.catalog.clearCache()`` that
bench.py and both correctness harnesses issue between queries.

Note the release is session-GLOBAL (Spark's cache manager has no
narrower public handle): don't wrap a scope around work whose caches a
concurrent consumer still needs — release at the pipeline-step boundary,
where nothing in flight depends on cached plans.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


@contextmanager
def released_cache(spark: SparkSession) -> Iterator[SparkSession]:
    """Run registry queries / library operators inside the scope; all
    DataFrame caches (the operators' plan-backing persists included) are
    released when it exits — success or failure."""
    try:
        yield spark
    finally:
        spark.catalog.clearCache()
