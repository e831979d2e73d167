"""A/B isolation of the storage_txn_acid r11 wall regression (VERDICT r11
item 2): did the append schema-on-write check (sources/txn.py, added round
11) cost the +38% (1.57 -> 2.17 s), or was it host weather?

Protocol: ONE session, interleaved A/B reps of the full storage_txn_acid
registry query —
  A = shipped code (schema check on),
  B = txn_append monkeypatched to skip the check (the r10 behavior:
      footer-ordered write, no compare).
Interleaving cancels slow host drift; medians are compared. A third leg
phase-times the check itself (manifest parse + dict compare + select
wrap) in isolation.

Usage: python tools/ab_txn_schema_check.py [reps_per_leg]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cyrela_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import cyrela_etl_spark.sources.txn as txn
    from cyrela_etl_spark.queries.storageq import storage_txn_acid

    spark = get_spark(app_name="ab-txn-schema-check")
    spark.sparkContext.setLogLevel("ERROR")

    # B-leg: txn_append without the schema check — write the delta in the
    # BATCH's column order (the r10 behavior) and skip compare/parse.
    real_append = txn.txn_append

    def append_nocheck(store, zone, key, df, read_version):
        if read_version < 1:
            raise ValueError("txn_append requires an initialized table")
        target = read_version + 1
        if txn.latest_version(store, zone, key) != read_version:
            raise txn.TxnConflictError(store.path(zone, key), target)
        parent = txn.read_manifest(store, zone, key, read_version)
        import uuid

        delta = store.path(zone, f"{key}/_snapshots/v{target:020d}-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(delta)
        manifest = {
            "version": target,
            "parent": read_version,
            "snapshot": delta,
            "snapshots": txn._version_dirs(parent) + [delta],
            "op": "append",
            "committed_at": time.time(),
        }
        if not txn._publish(store, zone, key, target, manifest):
            fs, _ = store._fs()
            fs.delete(txn._jpath(store, delta), True)
            raise txn.TxnConflictError(store.path(zone, key), target)
        return target

    # warmup (JVM + codegen + the query's own first-run costs)
    storage_txn_acid(spark, sf_dir).collect()
    spark.catalog.clearCache()

    a_samples: list[float] = []
    b_samples: list[float] = []
    for r in range(reps):
        for leg, samples in (("A", a_samples), ("B", b_samples)):
            # storageq imported txn_append into its own namespace via the
            # function-local import, so patch the MODULE it resolves from
            txn.txn_append = real_append if leg == "A" else append_nocheck
            t0 = time.perf_counter()
            storage_txn_acid(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            samples.append(dt)
            spark.catalog.clearCache()
            print(f"rep {r + 1}/{reps} leg {leg}: {dt:.3f}s", file=sys.stderr)
    txn.txn_append = real_append

    # phase timing: the check alone, on the same table shape
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from cyrela_etl_spark.sources.zones import ZoneStore

    root = tempfile.mkdtemp(prefix="txn_check_phase_")
    store = ZoneStore(spark=spark, root=root)
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        base = orders.filter(F.col("o_orderkey") <= 20000)
        txn.txn_init(store, "curated", "ord", base)
        extra = orders.filter(
            (F.col("o_orderkey") > 20000) & (F.col("o_orderkey") <= 21000)
        )
        phase: list[float] = []
        for _ in range(20):
            t0 = time.perf_counter()
            parent = txn.read_manifest(store, "curated", "ord", 1)
            table_schema = StructType.fromJson(json.loads(parent["schema_json"]))
            table_types = {f.name: txn._strip_nullability(f.dataType) for f in table_schema.fields}
            batch_types = {f.name: txn._strip_nullability(f.dataType) for f in extra.schema.fields}
            assert table_types == batch_types
            extra.select(*[f.name for f in table_schema.fields])
            phase.append(time.perf_counter() - t0)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    med_a = statistics.median(a_samples)
    med_b = statistics.median(b_samples)
    print(json.dumps({
        "reps_per_leg": reps,
        "A_check_on_median_sec": round(med_a, 3),
        "B_check_off_median_sec": round(med_b, 3),
        "delta_sec": round(med_a - med_b, 3),
        "delta_pct": round(100.0 * (med_a - med_b) / med_b, 1),
        "A_samples": [round(s, 3) for s in a_samples],
        "B_samples": [round(s, 3) for s in b_samples],
        "check_phase_median_ms": round(1000 * statistics.median(phase), 2),
        "check_phase_max_ms": round(1000 * max(phase), 2),
    }))


if __name__ == "__main__":
    main()
