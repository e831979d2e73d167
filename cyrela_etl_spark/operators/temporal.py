"""Temporal operators Spark lacks natively: as-of join and bucketized
range join, plus time-bucket rollups.

- **as-of join**: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented with the union-merge trick:
  tag and union both sides, one shuffle by key, a single ordered window
  carries the last right value forward (``last(..., ignorenulls=True)``).
  This is the scalable formulation — no range-condition join explosion,
  no per-key collect; one sort-within-partition per key group.
  (DuckDB expresses the same thing natively as ASOF JOIN — used as the
  test oracle.)

- **range join (bucketized)**: pairs within a time window. A naive
  inequality join degenerates to broadcast-nested-loop; bucketizing both
  sides to window-sized buckets and equality-joining on bucket and
  bucket+1 turns it into a hash join whose candidate set is only adjacent
  buckets.

- **time_bucket rollup**: tumbling aggregation = ``F.window`` over event
  time; the hypertable "continuous aggregate" pattern as a plain
  incremental groupBy (works identically in Structured Streaming with a
  watermark, see streaming/).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, append the nearest right row's value columns,
    matching on ``on``: ``direction="backward"`` (default) takes the most
    recent right row at-or-before the left timestamp; ``"forward"`` the
    earliest right row at-or-after it (the pandas merge_asof directions;
    DuckDB's ASOF JOIN expresses both via the inequality's sense). Left
    rows with no match in the direction get nulls.

    Ties: a right row with ts equal to the left ts IS visible (<= / >=),
    and among simultaneous right rows the one nearest the left row in
    union order wins — callers needing stricter tie-breaks should
    pre-dedup the right side.

    Plan (both directions): ONE key-partitioned window over the tagged
    union — backward fills with last(ignorenulls) over an unbounded-
    preceding frame, forward with first(ignorenulls) over an unbounded-
    following frame; only the frame and the equal-ts sort of the tag flip.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__rv_{c}") for c in right_value_cols],
    )
    # Backward: right rows sort BEFORE left rows at equal ts (__is_left
    # asc) so an equal-timestamp right row is visible to the left row
    # (<= semantics), and last(ignorenulls) over the preceding frame
    # picks the most recent. Forward mirrors both choices: left rows
    # sort first at equal ts (>= semantics) and first(ignorenulls) over
    # the following frame picks the earliest.
    merged = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(F.col(c), ignorenulls=True)  # noqa: E731
    else:
        w = (
            Window.partitionBy("__key")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(F.col(c), ignorenulls=True)  # noqa: E731
    filled = merged.select(
        "__is_left",
        "__left",
        *[fill(f"__rv_{c}").over(w).alias(f"__filled_{c}") for c in right_value_cols],
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col("__left")[c].alias(c) for c in lcols],
        *[F.col(f"__filled_{c}").alias(f"{c}{suffix}") for c in right_value_cols],
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Pairs (left, right) with same key and
    ``left.ts <= right.ts < left.ts + window_seconds``.

    Both sides get a bucket = floor(epoch/window); right candidates live in
    the left row's bucket or the next one, so the join is two equality
    probes instead of an unbounded inequality scan.
    """
    lb = left.withColumn("__bucket", F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds))
    rb = right.withColumn("__bucket", F.floor(F.unix_timestamp(F.col(right_ts)) / window_seconds))
    bucket_match = (F.col("r.__bucket") == F.col("l.__bucket")) | (
        F.col("r.__bucket") == F.col("l.__bucket") + 1
    )
    time_match = (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")) & (
        F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {window_seconds} SECONDS")
    )
    return (
        lb.alias("l")
        .join(rb.alias("r"), (F.col(f"l.{on}") == F.col(f"r.{on}")) & bucket_match & time_match)
        .drop("__bucket")
    )


def time_bucket(ts: Column | str, width: str = "1 hour") -> Column:
    """Tumbling-window start timestamp (hypertable time_bucket analogue)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.window(c, width).start


def gap_fill(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "event_type",
    width: str = "1 hour",
    count_col: str = "n_events",
) -> DataFrame:
    """Time-series resample with gap filling: per key, one row for EVERY
    bucket between the key's first and last event — missing buckets filled
    with a zero count (the hypertable `time_bucket_gapfill` analogue).

    Plan: one hash-agg to counts, a per-key min/max agg, a `sequence`
    generator to build the calendar spine (no driver loop, no cross join
    against a global calendar), and one left join back — all partitioned
    by key. Spine size is bounded by the key's own time span, so a
    100 TB/day table gap-fills without materializing a global calendar.
    """
    bucket = time_bucket(ts_col, width)
    counts = df.groupBy(F.col(key), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    spine = (
        counts.groupBy(key)
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("b0"), F.col("b1"), F.expr(f"INTERVAL {width}"))
            ).alias("bucket"),
        )
    )
    return spine.join(counts, [key, "bucket"], "left").select(
        key, "bucket", F.coalesce(F.col(count_col), F.lit(0)).cast("long").alias(count_col)
    )


def ohlc_downsample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    width: str = "1 hour",
) -> DataFrame:
    """OHLC bar downsampling: per key per time bucket, the opening value
    (earliest event; ties broken on ``tiebreak_col``), high, low, closing
    value (latest event), event count, and exact-decimal turnover — the
    hypertable/"candlestick" rollup every time-series store ships
    (TimescaleDB time_bucket + first/last, kdb xbar).

    Open/close use row_number over a fully-deterministic order
    (ts, tiebreak) — never first()/last() whose result is
    partition-order-dependent. high/low/count are pure comparisons;
    turnover sums DECIMAL(12,2) (associative-exact) and casts to double
    once at the end, per the engine's money contract.

    Plan: ONE exchange — the row_number window hash-partitions on
    (keys, bucket) and the subsequent groupBy on the same keys reuses
    that partitioning (no second shuffle; asserted in tests). State is
    O(bars), never O(events).

    ``width`` must be one of the calendar-aligned bucket widths below
    (they map to ``date_trunc`` units). Anything else raises — Spark's
    ``date_trunc`` returns NULL for unknown units, which would silently
    collapse every row into one null bucket.
    """
    width_units = {
        "1 second": "second",
        "1 minute": "minute",
        "1 hour": "hour",
        "1 day": "day",
        "1 week": "week",
        "1 month": "month",
        "1 quarter": "quarter",
        "1 year": "year",
    }
    unit = width_units.get(width, width if width in width_units.values() else None)
    if unit is None:
        raise ValueError(
            f"ohlc_downsample: unsupported width {width!r}; "
            f"use one of {sorted(width_units)} (or a bare date_trunc unit). "
            "Sub-unit widths ('15 minutes') need window()-style bucketing — "
            "see time_bucket in this module."
        )
    bucket = F.date_trunc(unit, F.col(ts_col))
    base = df.select(
        *key_cols,
        bucket.alias("bucket_start"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(value_col).alias("__v"),
    )
    keys = [*key_cols, "bucket_start"]
    w_asc = Window.partitionBy(*keys).orderBy(F.col("__ts").asc(), F.col("__tb").asc())
    w_desc = Window.partitionBy(*keys).orderBy(F.col("__ts").desc(), F.col("__tb").desc())
    marked = base.select(
        *keys,
        "__v",
        F.row_number().over(w_asc).alias("__rn_a"),
        F.row_number().over(w_desc).alias("__rn_d"),
    )
    return marked.groupBy(*keys).agg(
        F.max(F.when(F.col("__rn_a") == 1, F.col("__v"))).alias("open"),
        F.max("__v").alias("high"),
        F.min("__v").alias("low"),
        F.max(F.when(F.col("__rn_d") == 1, F.col("__v"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("__v").cast("decimal(12,2)")).cast("double").alias("turnover"),
    )
