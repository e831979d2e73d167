"""Streaming = incremental batch: every windowed builder must produce the
same relation under Structured Streaming (AvailableNow drain) as it does
on the batch read of the same data.
"""

from __future__ import annotations

from cyrela_etl_spark.sources.parquet import events_long_ts_schema, normalize_event_ts, read_events
from cyrela_etl_spark.streaming import (
    dedup_within_watermark,
    read_file_stream,
    run_available_now,
    tumbling_counts,
)


def _stream(spark, sf_dir):
    schema = events_long_ts_schema(spark, sf_dir)
    return normalize_event_ts(read_file_stream(spark, sf_dir, schema, path_glob="events.parquet"))


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_tumbling_stream_equals_batch(spark, sf_dir):
    batch = tumbling_counts(read_events(spark, sf_dir), width="1 hour")
    streamed = run_available_now(
        tumbling_counts(_stream(spark, sf_dir), width="1 hour"),
        "t_tumbling_eq", output_mode="complete",
    )
    assert _canon(streamed) == _canon(batch)


def test_stream_dedup_reconstructs_distinct(spark, sf_dir):
    s = _stream(spark, sf_dir)
    doubled = s.unionByName(_stream(spark, sf_dir))
    deduped = dedup_within_watermark(doubled, keys=["event_id"], watermark="1 hour")
    out = run_available_now(deduped.select("event_id"), "t_dedup_eq", output_mode="append")
    n_distinct = read_events(spark, sf_dir).select("event_id").distinct().count()
    assert out.count() == n_distinct
