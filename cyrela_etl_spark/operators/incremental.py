"""Incremental aggregate maintenance (algebraic partial-aggregate merge).

The lakehouse pattern the reference's nightly full-recompute DAG
(``dags/s3-etl-wallet-csv.py`` rebuilds the serving table from the whole
input every run) cannot afford at scale: when a new partition of facts
lands, a 100 TB pipeline must NOT rescan history. Instead it keeps a
keyed STATE table of *mergeable* partial aggregates — (count, sum, min,
max) are all algebraic: the state of (A ∪ B) is computable from the
states of A and B alone — and folds each delta in at a cost proportional
to |state| + |delta|, never |history|.

Spark-first shape: the merge is ``unionByName`` + one hash aggregate
with the MERGE functions (sum of counts, sum of sums, min of mins, max
of maxes). Both inputs are already aggregated, so the shuffle moves at
most 2×|keys| rows regardless of fact volume; with the state stored as a
bucketed zone table on the group key the exchange disappears entirely
(see sources/bucketed.py). AVG is deliberately NOT stored — it is not
algebraic; it is derived at read time as one exact division of the
decimal sum by the count (finalize_agg_state), which keeps the state
closed under merge and the output bit-stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# State-column names: fixed contract so states from different batches /
# sessions / writers merge without schema negotiation.
_CNT, _SUM, _MIN, _MAX = "agg_cnt", "agg_sum", "agg_min", "agg_max"


def partial_agg_state(
    df: DataFrame, keys: Sequence[str], value: str, sum_dtype: str = "decimal(18,2)"
) -> DataFrame:
    """One batch's partial-aggregate state for ``value`` grouped by
    ``keys``: (count, decimal-exact sum, min, max).

    The sum is carried as DECIMAL, not DOUBLE — decimal addition is
    associative, so the merged sum is exactly the sum a full recompute
    would produce no matter how the batches were split (float folds
    would drift with the merge tree shape and break the oracle).
    """
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(_CNT),
        F.sum(F.col(value).cast(sum_dtype)).alias(_SUM),
        F.min(value).alias(_MIN),
        F.max(value).alias(_MAX),
    )


def merge_agg_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold any number of partial states into one: union + a single hash
    aggregate applying each column's merge function. Input rows are
    already per-key aggregates, so this shuffles O(batches × |keys|)
    rows — independent of the fact volume that produced them."""
    if not states:
        raise ValueError("merge_agg_states: need at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum(_CNT).alias(_CNT),
        F.sum(_SUM).alias(_SUM),
        F.min(_MIN).alias(_MIN),
        F.max(_MAX).alias(_MAX),
    )


def finalize_agg_state(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Serve the state: per-key n/sum/avg/min/max with the derived (non-
    algebraic) AVG computed as ONE exact-int-over-int style division —
    cast(decimal sum → double) / count — so the value is bit-identical
    to any engine computing avg over the same rows."""
    return state.select(
        *keys,
        F.col(_CNT).alias("n"),
        F.col(_SUM).cast("double").alias("total"),
        (F.col(_SUM).cast("double") / F.col(_CNT)).alias("avg_value"),
        F.col(_MIN).alias("min_value"),
        F.col(_MAX).alias("max_value"),
    )
