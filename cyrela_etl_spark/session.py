"""SparkSession construction with scale-appropriate defaults.

The reference creates its session with hand-carried S3A conf and no
optimizer tuning (reference spark/jobs/pr-wallet-data-tf.py:7-29, 1 core /
1 GiB). Here the session is built once with AQE, broadcast-join thresholds
and Arrow enabled — the settings that matter both on ``local[*]`` test runs
and on a large cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the test harness (local[$SPARK_GRAFT_CPUS], 128 GiB
# host). On a real cluster the same builder is used but master/memory come
# from spark-submit; everything else is cluster-size-agnostic.
_DEFAULT_CONF: dict[str, str] = {
    # Adaptive query execution: runtime shuffle-partition coalescing,
    # skew-join splitting, and dynamic broadcast conversion. Essential at
    # 100 TB where static planning guesses wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / mapInPandas / toPandas crossing.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast small dimension tables (region/nation/supplier at any SF).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Session timezone pinned so date/timestamp semantics are deterministic
    # across test hosts and match the DuckDB oracle (UTC).
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: the reference relies on permissive casts (DAY() over date
    # strings, reference spark/jobs/pr-wallet-data-tf.py:93-106).
    "spark.sql.ansi.enabled": "false",
    # Parquet vectorized reader + pushdown are on by default; pinned here
    # as an explicit contract the tests assert on.
    "spark.sql.parquet.filterPushdown": "true",
    # Keep shuffle sizes sane in local mode; AQE coalesces below this.
    "spark.sql.shuffle.partitions": "32",
    # Quieter local runs.
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "cyrela-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores) so tests, bench.py and the driver share one code path; on a
    cluster pass ``master=None`` with a pre-set master URL in the
    environment and it is left untouched.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    # Respect an externally-managed master (spark-submit / cluster mode).
    if not os.environ.get("SPARK_MASTER_OVERRIDE"):
        builder = builder.master(master)

    conf = dict(_DEFAULT_CONF)
    # Local mode runs everything in one JVM whose default 1g heap is far
    # below this host's capacity — size it explicitly (no-op if a JVM
    # already exists; on a cluster spark-submit owns these).
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    conf.setdefault("spark.driver.maxResultSize", "4g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
