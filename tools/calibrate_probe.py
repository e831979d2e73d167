"""Calibrate bench.py's host-normalization probe (VERDICT r11 item 1).

Runs the three fixed reference kernels (spark shuffle-agg, single-thread
md5, single-thread 1 GB memory sweep — the bw kernel landed round 16,
VERDICT r15 item 2) N times on an idle host and prints per-rep times +
min/median. bench.py normalizes by the MEAN over checkpoints interleaved
through the sweep; PROBE_REF is a frozen UNIT (median of one idle
calibration), not a truth claim — the idle host itself drifts 20%+
between calibrations. Rerun this ONLY to re-pin after a deliberate
KERNEL change; the whole point of the pin is that it never moves with
host weather.

Usage: python tools/calibrate_probe.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import probe_once  # noqa: E402

from cyrela_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark(app_name="probe-calibration")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + codegen + bw buffer page-faults, same as bench
    probe_once(spark)
    sp, py, bw = [], [], []
    for i in range(reps):
        s, p, b = probe_once(spark)
        sp.append(s)
        py.append(p)
        bw.append(b)
        print(f"rep {i + 1}/{reps}: spark={s:.3f}s py={p:.3f}s bw={b:.3f}s")
    print(f"min:    spark={min(sp):.3f} py={min(py):.3f} bw={min(bw):.3f}")
    print(
        f"median: spark={statistics.median(sp):.3f} "
        f"py={statistics.median(py):.3f} "
        f"bw={statistics.median(bw):.3f}  <- pin convention"
    )
    print(
        f"spread: spark={min(sp):.3f}-{max(sp):.3f} "
        f"py={min(py):.3f}-{max(py):.3f} bw={min(bw):.3f}-{max(bw):.3f}"
    )


if __name__ == "__main__":
    main()
