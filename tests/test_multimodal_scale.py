"""Scale-behavior pins for the multimodal/Arrow family (VERDICT r14
item 5) — the pytest twins of tools/scale_curve_multimodal.py:

1. metadata-only queries over a binary-asset table never deserialize
   payloads (the README claim), witnessed two ways: the executed
   ReadSchema excludes the payload column, and the JVM's /proc/<pid>/io
   rchar delta for the metadata scan is a small fraction of the decode
   leg's (rchar — not Hadoop FileSystem statistics, which Spark's
   vectorized parquet reader bypasses for column pages).
2. asset dedup shuffles DIGESTS, not payloads: the md5+length hash-agg's
   shuffle write bytes (executed-plan SQLMetrics) stay a small fraction
   of the payload volume and within a per-row digest budget.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _jvm_rchar(spark) -> int:
    pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())
    with open(f"/proc/{pid}/io") as fh:
        return int(next(line for line in fh if line.startswith("rchar")).split()[1])


def _shuffle_bytes_written(df) -> int:
    """Sum of shuffleBytesWritten over every exchange in the EXECUTED
    plan (walks through the adaptive wrapper and materialized query
    stages)."""
    total = 0

    def walk(node):
        nonlocal total
        name = node.nodeName()
        # ShuffleExchangeExec's nodeName is the bare "Exchange"
        # (BroadcastExchangeExec prints "BroadcastExchange")
        if "ShuffleExchange" in name or name == "Exchange":
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "shuffleBytesWritten":
                    total += int(kv._2().value())
        if name.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return total


def test_metadata_only_scan_never_reads_payloads(spark, sf_dir, tmp_path):
    from cyrela_etl_spark.operators.multimodal import (
        extract_media_meta,
        synthesize_media,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    synthesize_media(docs).write.parquet(str(tmp_path / "assets"))
    assets = spark.read.parquet(str(tmp_path / "assets"))

    # decode leg: genuinely reads every payload byte
    b0 = _jvm_rchar(spark)
    payload_bytes = (
        extract_media_meta(assets, strict=True).agg(F.sum("n_bytes")).collect()[0][0]
    )
    decode_read = _jvm_rchar(spark) - b0
    assert payload_bytes > 0

    # metadata-only leg: payload column pruned at the scan
    b0 = _jvm_rchar(spark)
    mo = assets.groupBy("media_type").agg(F.count(F.lit(1)).alias("n"))
    n_total = sum(r["n"] for r in mo.collect())
    meta_read = _jvm_rchar(spark) - b0
    assert n_total == docs.count()

    plan = mo._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[-1]
    assert "payload" not in read_schema, plan
    # generous bound: footers + the media_type column vs full payloads
    # (measured ~3-6% at 500 docs; flaky-proofed to 35%)
    assert meta_read < 0.35 * decode_read, (meta_read, decode_read)


def test_asset_dedup_shuffle_carries_digests_not_payloads(spark, sf_dir, tmp_path):
    from cyrela_etl_spark.operators.multimodal import synthesize_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    synthesize_media(docs).write.parquet(str(tmp_path / "assets"))
    assets = spark.read.parquet(str(tmp_path / "assets"))
    n_docs = docs.count()
    payload_bytes = assets.agg(F.sum(F.length("payload"))).collect()[0][0]

    dd = (
        assets.select(
            "doc_id",
            F.md5("payload").alias("content_md5"),
            F.length("payload").cast("long").alias("n_bytes"),
        )
        .groupBy("content_md5", "n_bytes")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("doc_id").cast("long").alias("canonical_id"),
        )
    )
    # collect dd ITSELF: the metrics walk reads this plan's executed
    # exchanges (executing a derived aggregate would leave dd's own
    # SQLMetrics at zero)
    rows = dd.collect()
    assert sum(r["n_copies"] for r in rows) == n_docs

    shuffled = _shuffle_bytes_written(dd)
    assert shuffled > 0, "expected the hash-agg exchange to report metrics"
    # digest rows are ~51 B (+ serialization framing); payloads are KBs.
    # Budget: 200 B per input row AND a payload-fraction ceiling.
    assert shuffled <= 200 * n_docs, (shuffled, n_docs)
    assert shuffled < 0.25 * payload_bytes, (shuffled, payload_bytes)
