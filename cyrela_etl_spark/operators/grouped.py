"""Grouped-map pandas operators (``groupBy(...).applyInPandas``) — the
third leg of the pandas-UDF surface (SURVEY.md §2.10) next to
``mapInPandas`` (operators/multimodal.py) and ``applyInPandasWithState``
(streaming/stateful.py): one pandas DataFrame per group in, one out.

``minmax_normalize`` exists to exercise and test that surface; for THIS
actual computation (per-key min/max scaling) prefer
``minmax_normalize_window`` below — ``min/max OVER (PARTITION BY key)``
is pure-JVM (whole-stage codegen, no Arrow transfer, no Python workers)
and several times faster. Reach for ``applyInPandas`` only when the
per-group logic genuinely can't be expressed with window/agg functions.

Scale: applyInPandas shuffles by the grouping key (same exchange a
groupBy-agg does) and hands each group to a Python worker as Arrow
batches. A group must fit in one worker's memory — per-user/per-entity
groups (bounded by nature) qualify; never key a grouped-map by something
unbounded like a date over the whole corpus.

Determinism contract: group statistics here are exact integers (cents
min/max), and the normalized value is a single IEEE-754 division of two
exact ints — bit-identical in any engine, no float-fold order anywhere.
Cent conversion rounds HALF AWAY FROM ZERO (sign-aware floor(|v|+0.5))
to match SQL ``round()`` semantics (DuckDB, Spark both half-away);
pandas ``Series.round`` is banker's rounding (half-to-even) and would
diverge from the oracle on exact .5-cent products (e.g. 0.125 * 100).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cents_half_away(values: pd.Series) -> pd.Series:
    """value*100 rounded half away from zero, as int64 — the pandas twin
    of SQL ``CAST(round(value * 100) AS BIGINT)``."""
    v = values.to_numpy(dtype="float64") * 100.0
    return pd.Series(
        (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64"), index=values.index
    )


def minmax_normalize(
    events: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key min-max normalization of event values into [0, 1]:
    ``(cents − min) / (max − min)`` with integer cents, 0.0 for a key
    whose values are all equal (rng 1 guard, numerator 0).

    Grouped-map (Arrow) formulation — the pandas-UDF surface demo. For
    production use of this exact computation prefer
    ``minmax_normalize_window`` (pure-JVM, parity-tested identical).
    """
    schema = f"{id_col} long, {key} long, value_cents long, norm_value double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = _cents_half_away(pdf[value_col])
        mn, mx = cents.min(), cents.max()
        rng = int(mx - mn) or 1
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                key: pdf[key].astype("int64"),
                "value_cents": cents,
                "norm_value": (cents - mn) / rng,
            }
        )

    # Pin the grouped-map shuffle at session parallelism: AQE's byte-based
    # coalescing sees only the tiny shuffle payload (a few MB at bench SF),
    # not the per-group PYTHON cost behind it, and collapses the exchange
    # to ONE partition — measured 4.7 s single-task for ~1500 group calls
    # at sf0.1 (guide §4: opaque Python operators defeat byte-based
    # planning). An explicit hash repartition on the grouping key already
    # satisfies the grouped-map's required distribution (no second
    # exchange) and user-specified partitioning is exempt from AQE
    # coalescing. defaultParallelism adapts to the session/cluster size.
    n = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select(id_col, key, value_col)
        .repartition(n, key)
        .groupBy(key)
        .applyInPandas(norm, schema)
    )


def minmax_normalize_window(
    events: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Same relation as ``minmax_normalize`` via JVM window functions —
    the recommended path: ``min/max OVER (PARTITION BY key)`` stays in
    whole-stage codegen (one shuffle on key, no Arrow round-trip, no
    Python workers). Spark ``round()`` is HALF_UP (away from zero),
    matching ``_cents_half_away`` exactly.
    """
    w = Window.partitionBy(key)
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = events.select(
        F.col(id_col), F.col(key).cast("long").alias(key), cents.alias("value_cents")
    )
    mn, mx = F.min("value_cents").over(w), F.max("value_cents").over(w)
    rng = F.when(mx == mn, F.lit(1)).otherwise(mx - mn)
    return base.select(
        id_col,
        key,
        "value_cents",
        ((F.col("value_cents") - mn) / rng).alias("norm_value"),
    )
