"""Registry-wide scan audit: build every registered query's physical plan
at sf0.001 and count FileScan occurrences per parquet table. A table
scanned far more often than its role requires usually means a shared
intermediate is being recomputed (no ReusedExchange) — the pattern that
made dedup_dup_ngram_fraction run its corpus explode twice (fixed in
round 8 with a persist; cold-run 7.7 s → 4.4 s at sf0.1).

Heuristic, not a gate: multi-scan is CORRECT for unions (the planted
corpus is a deliberate 3-way union → 3 scans per use), multi-source
queries, and tiny dims (re-scanning a broadcast dim is free). The audit
exists so every >threshold count has been LOOKED AT; reviewed cases are
listed in REVIEWED with one-line justifications.

Usage: python tools/scan_audit.py [sf_dir] [threshold]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# (query, table) pairs reviewed as legitimately multi-scanned. NOTE:
# this audit counts PRE-EXECUTION lineage — queries that persist() their
# shared intermediate still print the full lineage per consumer here, but
# at runtime the persisted subtree is computed once (InMemoryTableScan).
# Round-8 review of everything ≥ 7 (the full list + timings in
# NOTES.md):
REVIEWED = {
    # Wedge/pair graphs: edge list + directed union + degree table are
    # all persisted inside the operator (graph.py) — plan lineage
    # overcounts; runtimes at sf0.1: 4.6 s / 4.3 s (inherent Σdeg² wedge
    # join, adjudicated sound in VERDICT r7).
    ("graph_link_prediction", "documents"),
    ("graph_assortativity", "documents"),  # persist added in round 8
    # Fold-free PCA re-reads the long (vec, dim, val) format per unrolled
    # round BY DESIGN (no driver loop state; oracle replays each round);
    # 1.2 s at sf0.1.
    ("vector_power_iteration_pca", "embeddings"),
    # Calibration compares the 16-hash sketch against exact Jaccard over
    # planted pairs — both legs share the corpus by construction; 1.5 s.
    ("dedup_minhash_calibration", "documents"),
    # Domain-mix weights read per-source and global aggregates; 0.7 s.
    ("corpus_domain_mix", "documents"),
    # Signatures are persisted inside the operator (dedup.py:304).
    ("dedup_minhash_lsh", "documents"),
    # Drift profiles compare two halves of the same table — two scans
    # per profile stage is the semantics.
    ("storage_histogram_drift", "orders"),
    ("events_heatmap_drift", "events"),
    # Train/test legs + shingle df filter share the corpus; kept relation
    # is reduced before the join.
    ("ml_leakage_check", "documents"),
    # Centroid seeding + assignment + means: base relation persisted in
    # clustering.py; lineage overcounts.
    ("vector_cluster_quality", "embeddings"),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from cyrela_etl_spark.queries import load_all
    from cyrela_etl_spark.session import get_spark

    spark = get_spark(app_name="scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    flagged: list[tuple[str, str, int]] = []
    for name, (fn, _oracle) in reg.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-only entries can't batch-plan
            print(f"#  skip {name}: {type(e).__name__}")
            continue
        counts: dict[str, int] = {}
        for m in re.finditer(r"FileScan \w+ .*?([a-z_0-9]+)\.parquet", plan):
            t = m.group(1)
            counts[t] = counts.get(t, 0) + 1
        for t, c in sorted(counts.items()):
            if c >= threshold and (name, t) not in REVIEWED:
                flagged.append((name, t, c))

    print(f"\n== tables scanned >= {threshold}x in one plan ==")
    for name, t, c in sorted(flagged, key=lambda x: -x[2]):
        print(f"{c:3d}  {name:40s} {t}")
    if not flagged:
        print("(none)")


if __name__ == "__main__":
    main()
