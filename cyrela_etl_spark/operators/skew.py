"""Skew-mitigation operators: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only helps sort-merge
joins and needs the skew to be visible in map output sizes. Salting is the
explicit, planner-independent tool for pathological hot keys (the 100 TB
case: one user_id owning 1% of all events):

- **salted_join**: the probe side gets a deterministic salt in [0, S);
  the build side is replicated S×. The hot key's rows then spread over S
  reducer partitions instead of one. Cost: build side inflates S× — use
  for dimension-sized or pre-filtered build sides.
- **salted_agg**: two-phase aggregation through an explicit salt —
  partial per (key, salt), final per key. Spark's hash aggregate already
  does map-side partials, so this only wins when the DISTINCT-like state
  per key is itself huge; exposed mostly as the documented pattern.

Results are exactly those of the unsalted operation (the declared query
``join_salted`` proves it against a plain-SQL oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salts: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted and the right
    (small/replicable) side exploded across all salt values.

    ``salt_on`` names a left column whose hash spreads rows of one hot join
    key across salts (pick something uniform-ish per row, e.g. a line
    number or unique id); defaults to all left columns (row-content hash —
    deterministic, no rand()).
    """
    if salts < 1:
        raise ValueError("salts must be >= 1")
    salt_cols: list[Column] = (
        [F.col(salt_on)] if salt_on else [F.col(c) for c in left.columns]
    )
    l = left.withColumn("__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salts)).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    cond = [l[c] == r[c] for c in on] + [l["__salt"] == r["__salt"]]
    joined = l.join(r, cond, how)
    # Drop the salt and the right side's duplicated key columns.
    out = joined.drop(l["__salt"]).drop(r["__salt"])
    for c in on:
        out = out.drop(r[c])
    return out


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salts: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for decomposable aggregates.

    ``aggs`` maps output name → partial aggregate expression; the final
    phase re-aggregates partials with the matching combiner (sum of sums,
    sum of counts, min of mins, max of maxes — the caller's expressions
    must be decomposable; averages should be shipped as sum+count).
    """
    salt_cols = [F.col(salt_on)] if salt_on else [F.col(c) for c in df.columns]
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )

    def _combine(name: str, expr: Column) -> Column:
        # Recombine by the aggregate family encoded in the partial's plan.
        s = expr._jc.toString().lower()
        src = F.col(f"__p_{name}")
        if s.startswith("min"):
            return F.min(src).alias(name)
        if s.startswith("max"):
            return F.max(src).alias(name)
        # sum / count / sum-of-products all recombine by sum.
        return F.sum(src).alias(name)

    return partial.groupBy(*keys).agg(*[_combine(n, e) for n, e in aggs.items()])
