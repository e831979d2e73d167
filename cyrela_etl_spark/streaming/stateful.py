"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 extension scope: the escape hatch for per-key logic the
built-in windowed aggregates can't express).

``running_totals`` keeps one (count, sum) state row per key and emits,
for every input event, the running event count and running value total up
to and including that event — the per-user "account balance so far"
pattern. The equivalent batch relation is a cumulative window aggregate,
which is exactly what the DuckDB oracle computes: a custom stateful
operator whose output is still value-exactly checkable.

Determinism: running sums accumulate in integer cents (round(value*100),
half AWAY from zero to match SQL round() — pandas Series.round is
half-to-even and would diverge on exact .5-cent products), so float
addition order can never drift.

Ordering contract: a group's rows arrive as MULTIPLE Arrow chunks (10k-row
default) and possibly across micro-batches, so per-chunk sorting is not a
global order. Within one micro-batch invocation all chunks are buffered and
concatenated before the (ts, event_id) sort — per-user groups are small by
nature (one human's events), so the buffer is bounded. ACROSS micro-batches
rows cannot be reordered retroactively; a row at or before the key's
max-seen (ts, event_id) is a late arrival and is DROPPED — the same
contract a watermarked streaming aggregation gives, made explicit here by
carrying max-seen in state.

Scale: state is 4 longs per key, partitioned by the grouping key across
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
STATE_SCHEMA = "n long, sum_cents long, max_ts long, max_event_id long"
_TS_FLOOR = -(2**63)


def running_totals(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key running (count, sum-in-cents) over an event stream.

    Late rows — (ts, event_id) at or before the key's max already
    processed in an earlier micro-batch — are dropped (see module
    docstring); within a micro-batch, ordering is global per key.
    """

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key_tuple
        n0, s0, max_ts, max_id = state.get if state.exists else (0, 0, _TS_FLOOR, -1)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values([ts_col, id_col])
            ts_i = pdf[ts_col].astype("int64")
            ids = pdf[id_col].astype("int64")
            on_time = (ts_i > max_ts) | ((ts_i == max_ts) & (ids > max_id))
            pdf, ts_i, ids = pdf[on_time], ts_i[on_time], ids[on_time]
            if len(pdf):
                from cyrela_etl_spark.operators.grouped import _cents_half_away

                cents = _cents_half_away(pdf[value_col])
                cum = cents.cumsum() + s0
                idx = np.arange(1, len(pdf) + 1, dtype="int64") + n0
                n0, s0 = n0 + len(pdf), int(cum.iloc[-1])
                max_ts, max_id = int(ts_i.iloc[-1]), int(ids.iloc[-1])
                yield pd.DataFrame(
                    {
                        "event_id": ids,
                        "user_id": key_val,
                        "running_n": idx,
                        "running_sum_cents": cum,
                    }
                )
        state.update((n0, s0, max_ts, max_id))

    return events.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
