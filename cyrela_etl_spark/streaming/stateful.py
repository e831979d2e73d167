"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 extension scope: the escape hatch for per-key logic the
built-in windowed aggregates can't express).

``running_totals`` keeps one (count, sum) state row per key and emits,
for every input event, the running event count and running value total up
to and including that event — the per-user "account balance so far"
pattern. The equivalent batch relation is a cumulative window aggregate,
which is exactly what the DuckDB oracle computes: a custom stateful
operator whose output is still value-exactly checkable.

Determinism: running sums accumulate in integer cents (round(value*100)),
so float addition order can never drift; rows within a key/batch are
processed in (ts, event_id) order.

Scale: state is 2 longs per key, partitioned by the grouping key across
executors and checkpointed by the state store; one shuffle on key — the
same cost profile as a streaming aggregation.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_id long, user_id long, running_n long, running_sum_cents long"
STATE_SCHEMA = "n long, sum_cents long"


def running_totals(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key running (count, sum-in-cents) over an event stream."""

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key_tuple
        n0, s0 = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, id_col])
            cents = (pdf[value_col] * 100).round().astype("int64")
            cum = cents.cumsum() + s0
            idx = np.arange(1, len(pdf) + 1, dtype="int64") + n0
            n0, s0 = n0 + len(pdf), int(cum.iloc[-1])
            yield pd.DataFrame(
                {
                    "event_id": pdf[id_col].astype("int64"),
                    "user_id": key_val,
                    "running_n": idx,
                    "running_sum_cents": cum,
                }
            )
        state.update((n0, s0))

    return events.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
