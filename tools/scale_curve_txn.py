"""Scale curve for the manifest-log commit protocol (sources/txn.py).

Per table size N (100k / 1M / 10M synthetic rows):
- ``txn_init``: version-1 full snapshot — linear in N by design (it IS
  the data write).
- ``txn_append`` of a FIXED 1k-row batch: the Delta-style add-only
  commit — must be ~CONSTANT in N (writes only the delta dir + a
  manifest of driver metadata; never rewrites the table).
- ``txn_upsert`` of a FIXED 1k-row batch: copy-on-write merge — linear
  in N (one anti-join + full rewrite; the documented trade for keyed
  MERGE without file-level deletion vectors).
- ``txn_read`` count of the latest version: linear scan.
- manifest byte size: constant (the protocol's metadata is O(1) in N).

Invariants at every scale: version numbers advance by 1 per commit,
read-after-append row count = N + appended rows, manifest size stays
within a constant bound.

Usage: python tools/scale_curve_txn.py [row_counts...]
       (default: 100000 1000000 10000000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402
from cyrela_etl_spark.sources.zones import ZoneStore  # noqa: E402
from cyrela_etl_spark.sources import txn  # noqa: E402

WORK = "/tmp/scale_txn"
BATCH = 1_000


def synth(spark, n: int, offset: int = 0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("grp"),
        (F.col("id") * 31 % 1_000_003).cast("double").alias("v"),
    )


def run_leg(spark, n: int) -> None:
    root = f"{WORK}/n{n}"
    shutil.rmtree(root, ignore_errors=True)
    store = ZoneStore(spark, root)
    zone, key = "curated", "t"

    t0 = time.perf_counter()
    v = txn.txn_init(store, zone, key, synth(spark, n))
    t_init = time.perf_counter() - t0

    t0 = time.perf_counter()
    v = txn.txn_append(store, zone, key, synth(spark, BATCH, offset=n), read_version=v)
    t_append = time.perf_counter() - t0

    t0 = time.perf_counter()
    got = txn.txn_read(store, zone, key).count()
    t_read = time.perf_counter() - t0
    assert got == n + BATCH, (got, n + BATCH)

    t0 = time.perf_counter()
    v = txn.txn_upsert(store, zone, key, synth(spark, BATCH), merge_key="k")
    t_upsert = time.perf_counter() - t0
    assert v == 3
    assert txn.txn_read(store, zone, key).count() == n + BATCH

    mbytes = max(
        os.path.getsize(os.path.join(d, f))
        for d, _sub, fs in os.walk(f"{root}/{zone}/t/_txn")
        for f in fs
        if f.endswith(".json")
    )
    print(
        f"N={n:>9,}  init={t_init:6.2f}s  append(1k)={t_append:6.2f}s  "
        f"read={t_read:5.2f}s  upsert(1k)={t_upsert:6.2f}s  manifest<= {mbytes} B"
    )
    shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    spark = get_spark(app_name="txn-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    run_leg(spark, 10_000)  # warmup (codegen + fs machinery)
    for n in sizes:
        run_leg(spark, n)


if __name__ == "__main__":
    main()
