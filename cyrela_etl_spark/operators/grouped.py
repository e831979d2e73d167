"""Grouped-map pandas operators (``groupBy(...).applyInPandas``) — the
third leg of the pandas-UDF surface (SURVEY.md §2.10) next to
``mapInPandas`` (operators/multimodal.py) and ``applyInPandasWithState``
(streaming/stateful.py): one pandas DataFrame per group in, one out.

Scale: applyInPandas shuffles by the grouping key (same exchange a
groupBy-agg does) and hands each group to a Python worker as Arrow
batches. A group must fit in one worker's memory — per-user/per-entity
groups (bounded by nature) qualify; never key a grouped-map by something
unbounded like a date over the whole corpus.

Determinism contract: group statistics here are exact integers (cents
min/max), and the normalized value is a single IEEE-754 division of two
exact ints — bit-identical in any engine, no float-fold order anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

NORM_SCHEMA = "event_id long, user_id long, value_cents long, norm_value double"


def minmax_normalize(
    events: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key min-max normalization of event values into [0, 1]:
    ``(cents − min) / (max − min)`` with integer cents, 0.0 for a key
    whose values are all equal (rng 1 guard, numerator 0)."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf[value_col] * 100).round().astype("int64")
        mn, mx = cents.min(), cents.max()
        rng = int(mx - mn) or 1
        return pd.DataFrame(
            {
                "event_id": pdf[id_col].astype("int64"),
                "user_id": pdf[key].astype("int64"),
                "value_cents": cents,
                "norm_value": (cents - mn) / rng,
            }
        )

    return events.select(id_col, key, value_col).groupBy(key).applyInPandas(norm, NORM_SCHEMA)
