"""Capture `.explain("formatted")` for bench headline queries (or a
given subset) into plans/<round>/<query>_<tag>.txt (round from
$SPARK_GRAFT_PLANS_ROUND, default r18).

Usage:
    python tools/capture_plans.py before [names...]
    python tools/capture_plans.py after  [names...]

Runs under the engine session at $SPARK_GRAFT_SF_DIR (default sf0.1),
building each query's DataFrame WITHOUT executing it (streaming-drain
queries do execute their drain on build — noted in the file header).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    import bench
    from cyrela_etl_spark.queries import load_all
    from cyrela_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    targets = names or bench.HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in targets:
        fn, _oracle = registry[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure, keep sweeping
            plan = f"EXPLAIN FAILED: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({tag})\n")
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
