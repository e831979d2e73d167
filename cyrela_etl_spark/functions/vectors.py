"""Vector math over ArrayType columns — JVM-side, no Python UDFs.

Built from ``zip_with`` / ``aggregate`` higher-order functions: the fold is
sequential over array order, so results are bit-reproducible (and match an
oracle that folds in the same order). For bulk top-k similarity the
``operators/similarity.py`` path uses Arrow-batched numpy matmul instead —
these column functions are the composable single-expression form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> so arithmetic happens in float64
    (matches any double-based oracle; float32 accumulation would drift)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (||a||·||b||) — null-safe only insofar as null arrays
    propagate null, matching SQL semantics."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
