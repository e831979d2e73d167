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

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
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

    Only left-preserving joins are salt-safe under this pattern: the right
    side is replicated once per salt, so ``right``/``full`` outer joins
    would emit every unmatched right row ``salts`` times (and a right-semi
    would dedupe by accident). Those are rejected rather than silently
    wrong — for a skewed right side, swap the inputs.
    """
    _SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in _SAFE_HOW:
        raise ValueError(
            f"salted_join(how={how!r}): only left-preserving joins are "
            f"salt-safe ({sorted(_SAFE_HOW)}); unmatched right rows would "
            f"duplicate once per salt"
        )
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


# Named recombiners for salted_agg — the full set of safely decomposable
# final phases. Anything else (avg, countDistinct, first, min_by/max_by)
# is NOT decomposable this way and must be expressed by the caller as a
# combination of these (avg = sum+count re-divided, etc.).
_COMBINERS: dict[str, Callable[[Column], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "bit_or": F.bit_or,
    "bit_and": F.bit_and,
    "bool_or": F.bool_or,
    "bool_and": F.bool_and,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    salts: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for decomposable aggregates.

    ``aggs`` maps output name → ``(partial_expr, combiner)`` where
    ``combiner`` names the final-phase re-aggregation explicitly (a key of
    ``_COMBINERS``: sum/min/max/bit_or/bit_and/bool_or/bool_and). The
    pairing is the caller's statement of decomposability — no inference
    from the partial's plan string, no silent mis-combining: count partials
    recombine by ``"sum"``, min by ``"min"``, and a mean ships as two
    entries (sum + count) divided afterwards. An unknown combiner raises.
    """
    salt_cols = [F.col(salt_on)] if salt_on else [F.col(c) for c in df.columns]
    for name, (_, combiner) in aggs.items():
        if combiner not in _COMBINERS:
            raise ValueError(
                f"salted_agg agg {name!r}: unknown combiner {combiner!r} "
                f"(expected one of {sorted(_COMBINERS)})"
            )
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    final = [
        _COMBINERS[combiner](F.col(f"__p_{name}")).alias(name)
        for name, (_, combiner) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final)


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Heavy-hitter profile of a join/aggregation key — the diagnostic you
    run BEFORE choosing between a plain shuffle join, a broadcast, and a
    salted join at 100 TB: per top-N key, its row count, rank, corpus
    share in exact ppm, and ``skew_x`` = count / mean-count-per-key (a
    skew_x of 50 on the top key says a plain shuffle sends 50× the average
    partition load to one reducer — salt it).

    Plan: one hash agg (map-side combine) → TakeOrderedAndProject for the
    top-N (each partition keeps N, the driver merges — NO single-reducer
    global sort) → rank window over the N-row result; the 1-row totals
    aggregate joins in via broadcast. Deterministic: ties break on key asc.
    """
    # r14 tail diet: counts feeds the totals AND the top-N — persist or
    # the fact-scale key agg runs twice. release: caller (cache contract)
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).persist()
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
        ),
    )
    return ranked.crossJoin(F.broadcast(totals)).select(
        "key",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("rank").cast("long").alias("rank"),
        F.expr("(cnt * 1000000) div total").alias("share_ppm"),
        (F.col("cnt") * F.col("n_keys") / F.col("total")).alias("skew_x"),
    )


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    buckets: int = 64,
) -> DataFrame:
    """Histogram-based equi-join cardinality estimation — the optimizer-
    statistics primitive every cost-based planner runs before choosing
    broadcast vs shuffle vs salted (Selinger-style, per-bucket variant):
    hash each side's key into ``buckets``, and per matching bucket
    estimate ``n_left·n_right / max(d_left, d_right)`` (the uniform-
    within-bucket / containment assumption), all in exact integer
    arithmetic. The one-row report carries the estimate NEXT TO the true
    join count and the ppm error, so the estimator itself is what the
    oracle value-checks — at 100 TB only the two tiny histogram aggs
    would run (the actual join is the thing being avoided).

    Plan: one hash agg per side (buckets-row outputs), a buckets-row
    join, plus the real join's count for the report. Estimation cost is
    independent of join output size.
    """
    def hist(df: DataFrame, n: str, d: str) -> DataFrame:
        return df.groupBy((F.col(key_col) % buckets).alias("bucket")).agg(
            F.count(F.lit(1)).cast("long").alias(n),
            F.countDistinct(key_col).cast("long").alias(d),
        )

    est = (
        hist(left, "n1", "d1")
        .join(hist(right, "n2", "d2"), "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets_matched"),
            F.sum(F.expr("(n1 * n2) div greatest(d1, d2)")).cast("long").alias("est_rows"),
        )
    )
    actual = (
        left.select(key_col)
        .join(right.select(key_col), key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    )
    return est.crossJoin(actual).select(
        "n_buckets_matched",
        "est_rows",
        "actual_rows",
        F.expr("(est_rows * 1000000) div actual_rows").alias("est_over_actual_ppm"),
    )
