"""Vacuum / checkpoint-compaction scaling curves for the txn layer
(sources/txn.py) against manifest chains of 10/100/1,000 commits —
VERDICT r12 item 5: append has a flat curve (scale_curve_txn.py);
vacuum and compaction did not.

Per chain length N (fresh table root each leg):

- build: txn_init + (N-1) txn_appends of a fixed 50-row batch (the
  variable is CHAIN LENGTH, not data volume); mean append wall is
  reported as a cross-check against the flat append curve. Manifest PUT
  bytes are accounted (every _write_bytes under _txn/): each append
  manifest lists the whole chain, so the plain build writes O(N^2)
  cumulative manifest bytes — the write-side residual VERDICT r14
  item 4 names.
- build_auto: the same appends with ``auto_compact_every=K`` (default
  64, env SPARK_GRAFT_AUTO_K) — every manifest stays O(K) paths, so
  cumulative manifest bytes are O(N·K) and the max single manifest is
  flat in N. The trade is explicit in the output: ``compactions`` counts
  the periodic full-table rewrites the cadence performs (data-write
  amplification ~ rows/2K per appended row at constant batch size —
  the knob a table owner tunes against read-path latency).
- read_latest: txn_read(latest).count() — the N-directory multi-path
  scan (one FileScan by contract; tests/test_txn_acid.py pins that).
- compact: txn_compact — reads the N-dir union, writes ONE full
  snapshot, commits version N+1. Expected linear in total rows (and in
  N while rows/commit is constant).
- vacuum_default / vacuum_eager (two legs since r17, matching shipped
  semantics): the production-default call (7-day retention) removes N
  versions' manifests and age-SPARES the N fresh unreferenced chain
  dirs; the explicit eager opt-out then sweeps them. Driver-side fs
  metadata ops only; each leg expected linear in its object count. A
  CONCURRENT READER thread loops full reads of the retained latest
  across both legs and must never fail or see a partial row set (the
  chain-aware retention guarantee; unit twin:
  tests/test_txn_acid.py::test_reader_racing_vacuum_never_fails).
- post-checks: latest still reads all rows; a removed version raises
  FileNotFoundError.

Output: one RESULT line per (N, leg) with wall seconds; the vacuum line
carries the concurrent reader's iteration count and failure count.

Usage: python tools/scale_curve_txn_vacuum.py [chain_lengths...]
       (default: 10 100 1000)
"""

from __future__ import annotations

import os
import shutil
import sys
import threading
import time

sys.path.insert(0, ".")

from cyrela_etl_spark.session import get_spark  # noqa: E402
from cyrela_etl_spark.sources.txn import (  # noqa: E402
    latest_version,
    txn_append,
    txn_compact,
    txn_init,
    txn_read,
    vacuum,
)
from cyrela_etl_spark.sources.zones import ZoneStore  # noqa: E402

ROWS_PER_COMMIT = 50


def batch(spark, start: int):
    # one file per commit — a 50-row batch spread over the default 32
    # partitions would write 32 files per append (32k files at N=1000)
    # and time the task-launch overhead instead of the commit protocol.
    # JVM-side range, not createDataFrame(list).coalesce(1): coalesce on
    # a parallelized local collection computes all 32 parent partitions
    # serially in ONE task (~4 s per tiny batch); range+coalesce is a
    # single JVM partition from the start (~0.2 s).
    from pyspark.sql import functions as F

    return (
        spark.range(start, start + ROWS_PER_COMMIT, 1, 1)
        .select(
            F.col("id").cast("int").alias("account_id"),
            (F.col("id") * 3).cast("int").alias("balance"),
        )
    )


def main() -> None:
    chains = [int(s) for s in sys.argv[1:]] or [10, 100, 1000]
    spark = get_spark(app_name="scale-curve-txn-vacuum")
    spark.sparkContext.setLogLevel("ERROR")

    import cyrela_etl_spark.sources.txn as txn_mod

    auto_k = int(os.environ.get("SPARK_GRAFT_AUTO_K", "64"))

    class PutCounter:
        """Accounts manifest PUT traffic: every _write_bytes under _txn/
        (temp manifest writes — exactly the bytes a publish ships)."""

        def __init__(self):
            self.real = txn_mod._write_bytes
            self.bytes = 0
            self.puts = 0
            self.max_put = 0

        def __enter__(self):
            def counting(store, path, data):
                if "/_txn/" in path:
                    self.bytes += len(data)
                    self.puts += 1
                    self.max_put = max(self.max_put, len(data))
                return self.real(store, path, data)

            txn_mod._write_bytes = counting
            return self

        def __exit__(self, *exc):
            txn_mod._write_bytes = self.real

    for n in chains:
        root = f"/tmp/scale_txn_vacuum_{n}"
        shutil.rmtree(root, ignore_errors=True)
        store = ZoneStore(spark=spark, root=root)

        t0 = time.perf_counter()
        with PutCounter() as pc:
            v = txn_init(store, "curated", "t", batch(spark, 0))
            for i in range(1, n):
                v = txn_append(
                    store, "curated", "t", batch(spark, i * ROWS_PER_COMMIT), read_version=v
                )
        build_wall = time.perf_counter() - t0
        assert latest_version(store, "curated", "t") == n
        print(
            f"RESULT chain={n} leg=build wall={build_wall:.1f}s "
            f"mean_append={build_wall / n * 1000:.0f}ms "
            f"manifest_puts={pc.puts} manifest_bytes={pc.bytes} "
            f"max_manifest={pc.max_put}",
            flush=True,
        )

        # build_auto: same appends under the compaction cadence — the
        # write-side O(N^2) manifest term must collapse to O(N·K)
        auto_store = ZoneStore(spark=spark, root=f"{root}_auto")
        t0 = time.perf_counter()
        with PutCounter() as pca:
            av = txn_init(auto_store, "curated", "t", batch(spark, 0))
            for i in range(1, n):
                av = txn_append(
                    auto_store, "curated", "t", batch(spark, i * ROWS_PER_COMMIT),
                    read_version=av, auto_compact_every=auto_k,
                )
        auto_wall = time.perf_counter() - t0
        compactions = av - n  # every version beyond the n data commits
        assert txn_read(auto_store, "curated", "t").count() == n * ROWS_PER_COMMIT
        assert pca.max_put <= (auto_k + 2) * 200 + 2000, (
            f"max manifest {pca.max_put} B not O(K) at K={auto_k}"
        )
        print(
            f"RESULT chain={n} leg=build_auto K={auto_k} wall={auto_wall:.1f}s "
            f"mean_append={auto_wall / n * 1000:.0f}ms compactions={compactions} "
            f"manifest_puts={pca.puts} manifest_bytes={pca.bytes} "
            f"max_manifest={pca.max_put}",
            flush=True,
        )
        shutil.rmtree(f"{root}_auto", ignore_errors=True)

        t0 = time.perf_counter()
        total = txn_read(store, "curated", "t").count()
        print(
            f"RESULT chain={n} leg=read_latest wall={time.perf_counter() - t0:.2f}s "
            f"rows={total}",
            flush=True,
        )
        assert total == n * ROWS_PER_COMMIT

        t0 = time.perf_counter()
        cv = txn_compact(store, "curated", "t")
        print(
            f"RESULT chain={n} leg=compact wall={time.perf_counter() - t0:.2f}s "
            f"version={cv}",
            flush=True,
        )

        want = n * ROWS_PER_COMMIT
        # SPARK_GRAFT_VACUUM_READER=0 turns the concurrent reader off for
        # a clean vacuum wall (attribution: the reader's continuous full
        # reads compete with vacuum for the py4j gateway and driver)
        with_reader = os.environ.get("SPARK_GRAFT_VACUUM_READER", "1") != "0"
        stop = threading.Event()
        failures: list[BaseException] = []
        reads = [0]

        def reader():
            try:
                while True:
                    got = txn_read(store, "curated", "t").count()
                    assert got == want, f"reader saw {got} rows, want {want}"
                    reads[0] += 1
                    if stop.is_set():
                        break
            except BaseException as e:  # noqa: BLE001
                failures.append(e)

        rt = threading.Thread(target=reader)
        if with_reader:
            rt.start()
        # account the manifest JSON bytes vacuum ships over py4j (the
        # r13 residual: chain manifest v is O(v) bytes, so the old
        # read-every-vacuumable-manifest loop was O(N^2) bytes; the r14
        # listing-based vacuum reads retained manifests only — expected
        # O(keep_last * N) here, i.e. ONE manifest of ~N dir paths).
        import cyrela_etl_spark.sources.txn as txn_mod

        vac_stats = {"manifests_read": 0, "manifest_bytes": 0}
        real_read = txn_mod._read_json
        vac_thread = threading.get_ident()  # don't count the reader thread's reads

        def counting_read(st, path):
            m = real_read(st, path)
            if threading.get_ident() == vac_thread:
                vac_stats["manifests_read"] += 1
                import json as _json

                vac_stats["manifest_bytes"] += len(_json.dumps(m))
            return m

        # Two legs since round 17 (VERDICT r16 item 5 — the curve must
        # match SHIPPED semantics): `vacuum_default` is the production
        # default (7-day retention: every below-floor manifest goes, the
        # fresh unreferenced chain dirs are age-SPARED), then
        # `vacuum_eager` is the explicit opt-out that sweeps what the
        # default spared. Together they do exactly the old single eager
        # leg's work; the concurrent reader spans both. The VacuumReport
        # (r17) makes the split assertable: default sweeps nothing and
        # spares n dirs, eager sweeps those n dirs and spares nothing.
        txn_mod._read_json = counting_read
        t0 = time.perf_counter()
        try:
            removed = vacuum(store, "curated", "t", keep_last=1)
        finally:
            txn_mod._read_json = real_read
        print(
            f"RESULT chain={n} leg=vacuum_default wall={time.perf_counter() - t0:.2f}s "
            f"removed={len(removed)} swept_dirs={len(removed.swept_dirs)} "
            f"spared_dirs={len(removed.spared_dirs)} "
            f"manifests_read={vac_stats['manifests_read']} "
            f"manifest_bytes={vac_stats['manifest_bytes']}",
            flush=True,
        )
        assert len(removed) == n  # versions 1..n (compact is n+1)
        assert len(removed.swept_dirs) == 0  # all dirs fresh -> age-spared
        assert len(removed.spared_dirs) == n

        vac_stats = {"manifests_read": 0, "manifest_bytes": 0}
        txn_mod._read_json = counting_read
        t0 = time.perf_counter()
        try:
            eager = vacuum(store, "curated", "t", keep_last=1, min_age_sec=0)
        finally:
            txn_mod._read_json = real_read
            stop.set()
            if with_reader:
                rt.join()
        print(
            f"RESULT chain={n} leg=vacuum_eager wall={time.perf_counter() - t0:.2f}s "
            f"removed={len(eager)} swept_dirs={len(eager.swept_dirs)} "
            f"spared_dirs={len(eager.spared_dirs)} reader_reads={reads[0]} "
            f"reader_failures={len(failures)} "
            f"manifests_read={vac_stats['manifests_read']} "
            f"manifest_bytes={vac_stats['manifest_bytes']}",
            flush=True,
        )
        assert not failures, failures
        assert len(eager) == 0  # manifests went in the default leg
        assert len(eager.swept_dirs) == n  # the space reclaim, observable
        assert len(eager.spared_dirs) == 0

        assert txn_read(store, "curated", "t").count() == want
        try:
            txn_read(store, "curated", "t", 1)
            raise AssertionError("vacuumed version 1 still readable")
        except FileNotFoundError:
            pass
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
