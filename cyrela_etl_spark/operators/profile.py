"""Data profiling + statistical monitoring — the observe()/ANALYZE side
of a lakehouse pipeline, as oracle-checkable operators.

`numeric_profile` is the per-column stats pass every warehouse runs
before choosing join strategies or flagging drift (ANALYZE TABLE /
dbt-style column profiles). `zscore_anomalies` is the standard
monitoring primitive: flag events whose value deviates > z·σ from the
key's mean.

Determinism: counts and distincts are exact ints; sums go through
DECIMAL (associative-exact) and every derived moment is a fixed chain of
IEEE ops over those exact endpoints — bit-reproducible against any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled numeric column: n_rows, n_nulls, n_distinct
    (exact), min/max as double.

    ONE aggregate pass computes every column's stats simultaneously (a
    single scan regardless of column count — per-column passes would scan
    the table len(cols) times); the wide 1-row result is then unpivoted
    driver-side into (column, stat...) rows. The unpivot touches a 1-row
    frame, so this stays a single job + a metadata-sized reshape.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def zscore_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    z: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Rows whose value deviates more than ``z`` standard deviations from
    their key's mean — the monitoring/outlier primitive.

    Moments come from exact DECIMAL sums: mean = S/n, sample variance =
    (n·Q − S²)/(n·(n−1)) with S = Σvalue, Q = Σvalue² both carried as
    decimals and cast to double once — so mean/σ are a short fixed chain
    of IEEE ops over identical endpoints on every engine, and the z-score
    (rounded before thresholding) is hash-stable.

    Plan: one hash agg to per-key moments (keys are low-cardinality by
    contract — event types, sensors), broadcast back over the scan, flag
    in a projection. Output is sized to the anomalies, not the input.
    """
    dec = F.col(value_col).cast("decimal(12,2)")
    stats = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(dec).cast("double").alias("__s"),
        F.sum(dec * dec).cast("double").alias("__q"),
    )
    n, s, q = F.col("__n"), F.col("__s"), F.col("__q")
    stats = stats.select(
        key_col,
        "__n",
        (s / n).alias("__mean"),
        F.sqrt((n * q - s * s) / (n * (n - 1))).alias("__std"),
    )
    # Keys with n=1 (std undefined, 0/0 → NaN) or zero variance would
    # otherwise flag EVERY row as an anomaly: both Spark and DuckDB order
    # NaN above any number, so |NaN| > z passes. Degenerate keys have no
    # meaningful z-score — drop them before the broadcast join.
    stats = stats.filter((n > 1) & (F.col("__std") > 0))
    joined = df.join(F.broadcast(stats), key_col)
    zscore = F.round((F.col(value_col) - F.col("__mean")) / F.col("__std"), round_digits)
    return (
        joined.select(
            F.col(id_col),
            F.col(key_col),
            F.col(value_col),
            F.round(F.col("__mean"), round_digits).alias("key_mean"),
            zscore.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > F.lit(z))
    )


def mad_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    threshold: float = 3.5,
    round_digits: int = 6,
) -> DataFrame:
    """Robust per-key outliers via the median absolute deviation — the
    modified z-score of Iglewicz & Hoaglin 1993 ("How to detect and
    handle outliers"): Mz = 0.6745·(x − median)/MAD, flag |Mz| > 3.5.
    The companion to zscore_anomalies for heavy-tailed values, where the
    outliers themselves inflate mean/σ and mask each other; medians are
    breakdown-resistant to 50% contamination.

    Determinism: both medians are exact interpolating percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, the agg_exact_median
    parity); |x − med| is one IEEE subtraction, the modified z-score a
    fixed three-op chain rounded before thresholding. Keys with MAD = 0
    (≥ half the values identical) have no meaningful deviation scale and
    are dropped, mirroring zscore_anomalies' degenerate-key guard.

    Plan: per-key median agg → broadcast back over the scan (keys are
    low-cardinality by contract) → per-key MAD agg over the deviations →
    second broadcast → flag in a projection. Two hash aggs + two
    broadcast joins, no window, output sized to the anomalies.
    """
    med = df.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    # r14 tail diet: dev feeds the MAD agg AND the scoring join — persist
    # or the scan + median broadcast join run twice. release: caller
    # (cache contract). Size note (ADVICE r14): dev is FACT-scale (one
    # row per input row) — prefer StorageLevel.DISK_ONLY at 100x+ scales
    # where the cache would pressure executor memory.
    dev = df.join(F.broadcast(med), key_col).withColumn(
        "__ad", F.abs(F.col(value_col) - F.col("__med"))
    ).persist()
    mad = (
        dev.groupBy(key_col)
        .agg(F.expr("percentile(__ad, 0.5)").alias("__mad"))
        .filter(F.col("__mad") > 0)
    )
    scored = dev.join(F.broadcast(mad), key_col)
    mz = F.round(
        F.lit(0.6745) * ((F.col(value_col) - F.col("__med")) / F.col("__mad")),
        round_digits,
    )
    return (
        scored.select(
            F.col(id_col),
            F.col(key_col),
            F.col(value_col),
            F.round(F.col("__med"), round_digits).alias("key_median"),
            F.round(F.col("__mad"), round_digits).alias("key_mad"),
            mz.alias("robust_z"),
        )
        .filter(F.abs(F.col("robust_z")) > F.lit(threshold))
    )


def histogram_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    bins: int = 20,
) -> DataFrame:
    """Distribution-drift report between two snapshots of a numeric
    column — the monitoring check run before retraining or after a
    pipeline change (the PSI/KS family; this is the L1 variant kept in
    exact integers so any engine reproduces it bit-for-bit).

    Shared bin edges come from the UNION's min/max in exact cents
    (round(value·100) as BIGINT), bin assignment is pure integer
    arithmetic, per-cohort shares are ppm integer divisions, and the
    drift contribution per bin is |share_a − share_b| in ppm — summable
    exactly downstream (Σ/2e6 ≈ total-variation distance).

    Plan: one agg for the shared edges (1 row, broadcast), one hash agg
    per cohort on the bin id, full-outer join of two ≤bins-row tables.
    Nothing shuffles more than the histograms themselves.
    """
    both = baseline.select(F.col(value_col).alias("v")).unionAll(
        current.select(F.col(value_col).alias("v"))
    )
    cents = F.round(F.col("v") * 100).cast("long")
    # r14 tail diet: edges (1 row) is consumed by BOTH cohorts' binning
    # and out (<= bins rows) by its total AND the share projection —
    # persist each or the union min/max scan (resp. the cohort's bin agg)
    # runs twice. release: caller (cache contract)
    edges = both.select(cents.alias("c")).agg(
        F.min("c").alias("min_c"), F.max("c").alias("max_c")
    ).persist()

    def _hist(df: DataFrame, name: str) -> DataFrame:
        c = F.round(F.col(value_col) * 100).cast("long")
        binned = df.select(c.alias("c")).crossJoin(F.broadcast(edges)).select(
            F.least(
                F.expr(f"((c - min_c) * {bins}) div (max_c - min_c + 1)"),
                F.lit(bins - 1),
            )
            .cast("long")
            .alias("bin")
        )
        out = binned.groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{name}")
        ).persist()  # release: caller (see diet note above)
        total = out.agg(F.sum(f"n_{name}").cast("long").alias(f"t_{name}"))
        return out.crossJoin(F.broadcast(total)).select(
            "bin",
            f"n_{name}",
            F.expr(f"(n_{name} * 1000000) div t_{name}").alias(f"share_{name}_ppm"),
        )
    a = _hist(baseline, "base")
    b = _hist(current, "curr")
    joined = a.join(b, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_curr", F.lit(0)).alias("n_curr"),
        F.coalesce("share_base_ppm", F.lit(0)).alias("share_base_ppm"),
        F.coalesce("share_curr_ppm", F.lit(0)).alias("share_curr_ppm"),
    )
    return joined.select(
        "*",
        F.abs(F.col("share_base_ppm") - F.col("share_curr_ppm")).alias("l1_ppm"),
    )


def equidepth_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    bins: int = 8,
) -> DataFrame:
    """Per-key equi-depth (equal-frequency) histogram — the profile the
    optimizer-statistics world prefers over equi-width when distributions
    are skewed (every bin holds ~n/bins rows, so heavy tails can't hide
    in one bucket).

    Scale shape: NOT a global sort/ntile (which would funnel the table
    through one reducer). Instead: one hash agg computes the bins-1 exact
    interior percentile boundaries per key (``percentile`` with an array
    of dyadic fractions — the same linear interpolation DuckDB's
    ``quantile_cont`` defines, bit-identical per the agg_exact_median
    precedent), the tiny per-key boundary table broadcasts back, bin
    assignment is a pure projection (count of boundaries strictly below
    the value), and a second hash agg on (key, bin) emits count/min/max.
    Two shuffles total, both key-partitioned; nothing global.

    ``bins`` should be a power of two so every boundary probability is an
    exact dyadic double on both engines.
    """
    probs = ", ".join(str(i / bins) for i in range(1, bins))
    nn = df.filter(F.col(value_col).isNotNull())
    bounds = nn.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, array({probs}))").alias("__bs")
    )
    binned = nn.join(F.broadcast(bounds), key_col).select(
        key_col,
        F.col(value_col).alias("__v"),
        F.aggregate(
            "__bs",
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.when(b < F.col(value_col), 1).otherwise(0),
        ).alias("bin"),
    )
    return binned.groupBy(key_col, "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("__v").alias("min_v"),
        F.max("__v").alias("max_v"),
    )


def winsorize_profile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key winsorization audit — the outlier-clipping prep step
    (clip to [p_lo, p_hi] exact percentiles) reported as what it WOULD
    do: how many rows clip at each tail, the clip bounds, and the
    decimal-exact sum of the untouched inliers. Feature pipelines run
    this before committing to a clip threshold.

    Same scale shape as equidepth_histogram: one hash agg for the two
    exact percentile bounds per key, broadcast back, pure-projection
    tail flags, one (key) hash agg. The output keeps inlier_total over
    ORIGINAL values (decimal-cast, the money contract) rather than a
    clipped mean — clipping at an interpolated double bound would drag
    engine-specific decimal rounding into the hash.
    """
    nn = df.filter(F.col(value_col).isNotNull())
    bounds = nn.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, array({p_lo}, {p_hi}))").alias("__b")
    ).select(
        key_col,
        F.col("__b")[0].alias("__lo"),
        F.col("__b")[1].alias("__hi"),
    )
    flagged = nn.join(F.broadcast(bounds), key_col).select(
        key_col,
        F.col(value_col).alias("__v"),
        "__lo",
        "__hi",
        F.when(F.col(value_col) < F.col("__lo"), 1).otherwise(0).alias("__is_lo"),
        F.when(F.col(value_col) > F.col("__hi"), 1).otherwise(0).alias("__is_hi"),
    )
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("__is_lo").cast("long").alias("n_clipped_lo"),
        F.sum("__is_hi").cast("long").alias("n_clipped_hi"),
        F.round(F.min("__lo"), round_digits).alias("lo_bound"),
        F.round(F.min("__hi"), round_digits).alias("hi_bound"),
        F.sum(
            F.when(
                (F.col("__is_lo") == 0) & (F.col("__is_hi") == 0),
                F.col("__v").cast("decimal(12,2)"),
            )
        )
        .cast("double")
        .alias("inlier_total"),
    )


def moments_profile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key distribution-shape profile: population variance, skewness
    and excess kurtosis from EXACT decimal power sums (n, Σx, Σx², Σx³,
    Σx⁴ — the one-pass raw-moment formulation every ANALYZE implements).
    The third/fourth moments extend storage_numeric_profile's min/max and
    the correlation profile's second-order sums: skew/kurtosis are the
    drift signals a histogram's bin edges quantize away.

    Determinism: the four power sums are decimal (association-free — any
    aggregation order yields the same digits), cast to double ONCE; the
    central-moment identities are then a fixed-form IEEE chain written
    identically in the oracle (skew's denominator is m2·√m2, NOT
    pow(m2,1.5) — sqrt is correctly rounded on every engine, libm pow is
    not guaranteed to be). Keys with n < 2 or zero variance have no
    defined shape and are dropped.

    Plan: ONE hash agg with map-side combine (the value fits the
    combiner: 5 scalars per key), then a key-sized projection. No joins,
    no window, no second pass over the data.
    """
    dec = F.col(value_col).cast("decimal(7,2)")
    x2 = dec * dec
    sums = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(dec).cast("double").alias("__s1"),
        F.sum(x2).cast("double").alias("__s2"),
        F.sum(x2 * dec).cast("double").alias("__s3"),
        F.sum(x2 * x2).cast("double").alias("__s4"),
    )
    n = F.col("n_rows").cast("double")
    m = F.col("__s1") / n
    r2 = F.col("__s2") / n
    r3 = F.col("__s3") / n
    r4 = F.col("__s4") / n
    m2 = r2 - m * m
    m3 = r3 - 3 * m * r2 + 2 * m * m * m
    m4 = r4 - 4 * m * r3 + 6 * m * m * r2 - 3 * m * m * m * m
    staged = sums.select(
        key_col,
        "n_rows",
        m.alias("__m"),
        m2.alias("__m2"),
        m3.alias("__m3"),
        m4.alias("__m4"),
    ).filter((F.col("n_rows") >= 2) & (F.col("__m2") > 0))
    return staged.select(
        key_col,
        "n_rows",
        F.round(F.col("__m"), round_digits).alias("mean_value"),
        F.round(F.col("__m2"), round_digits).alias("pop_variance"),
        F.round(
            F.col("__m3") / (F.col("__m2") * F.sqrt(F.col("__m2"))), round_digits
        ).alias("skewness"),
        F.round(
            F.col("__m4") / (F.col("__m2") * F.col("__m2")) - 3, round_digits
        ).alias("ex_kurtosis"),
    )
