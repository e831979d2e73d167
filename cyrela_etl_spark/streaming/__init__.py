"""Structured Streaming surface (reference S8 + SURVEY.md §2.9).

The reference's only trigger is an Airflow ``S3KeySensor`` polling a
landing prefix every 120 s (reference dags/s3-etl-wallet-csv.py:141-149);
here that becomes a Spark file-source stream — the idiomatic replacement:
the source *is* the directory listing, ``Trigger.AvailableNow`` gives the
batch-drain semantics the sensor+DAG pair emulated, and checkpointing
replaces XCom bookkeeping.

Design rule: every windowed/dedup transformation is a plain
DataFrame→DataFrame builder usable on BOTH batch and streaming inputs —
the batch run of the same builder is the test oracle for the streaming
run (and the DuckDB oracle checks the batch semantics).
"""

from cyrela_etl_spark.streaming.ops import (
    dedup_within_watermark,
    from_bus_envelope,
    rate_to_events,
    read_file_stream,
    read_rate_stream,
    replay_bus_stream,
    run_available_now,
    run_available_now_to_parquet,
    run_until_rows,
    session_agg,
    sliding_counts,
    stream_stream_interval_join,
    to_bus_envelope,
    tumbling_counts,
    write_bus_envelopes,
)

__all__ = [
    "read_file_stream",
    "read_rate_stream",
    "rate_to_events",
    "to_bus_envelope",
    "from_bus_envelope",
    "write_bus_envelopes",
    "replay_bus_stream",
    "run_available_now",
    "run_available_now_to_parquet",
    "run_until_rows",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "stream_stream_interval_join",
    "dedup_within_watermark",
]
