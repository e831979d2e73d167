"""Model-check wave 5 sweep: enumerate registry entries whose DuckDB
oracle SHARES the engine's construction (VERDICT r15 item 4).

The oracle gate's one structural blind spot: when the oracle SQL
re-derives the result through the SAME nontrivial construction the
Spark code uses (the md5-prefix hash trick, the same blocking key, the
same neighborhood enumeration, a transliterated expression tree), a bug
in the shared construction passes both engines. Waves 3-4 addressed a
hand-picked subset with plain-Python models; this sweep makes the
selection SYSTEMATIC so the remaining exposure is an explicit list,
not a guess.

Per registry entry it scores:
  - `md5_oracle`: oracle uses md5()/hash() — the engine's deterministic
    hash trick appearing on the oracle side is the strongest
    shared-construction signal (both sides compute the same buckets).
  - `oracle_len`: long oracles (>= 1200 chars) tend to be
    transliterations of the engine's expression tree rather than
    independent specifications.
  - `nests_construction`: oracle contains engine-flavored constructs
    (banding/shingling regexes, bit-fiddling, generate_series-driven
    n-gram enumeration) — heuristic keyword scan.
  - `modeled`: the query name appears in a tests/test_*model*.py file
    (wave 1-4 coverage).

Output: a markdown table of every entry that trips at least one
shared-construction signal, with its model-coverage status — the NOTES
inventory is generated from this. Entries tripping signals WITHOUT a
model are the wave-5 work queue, strongest signal first.

Usage: python tools/shared_construction_sweep.py [--all]
"""

from __future__ import annotations

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONSTRUCTION_TOKENS = [
    # engine-flavored constructs whose appearance in an ORACLE means the
    # oracle walks the same algorithm, not an independent spec
    "md5(",
    "hashtext",
    "generate_series",
    "unnest(range",
    "regexp_split_to_array",
    "string_split_regex",
    "list_transform",
    "list_aggregate",
    "lambda",
    "recursive",
    "bit_count",
    "xor(",
    ">> ",
    "& 255",
]


def main() -> None:
    from cyrela_etl_spark.queries import load_all

    registry = load_all()

    model_text = ""
    for path in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "tests", "test_*model*.py")
    ):
        with open(path) as fh:
            model_text += f"\n### {os.path.basename(path)}\n" + fh.read()

    rows = []
    for name, (_fn, oracle) in registry.items():
        if oracle is None:
            continue
        o = oracle.lower()
        tokens = sorted({t for t in CONSTRUCTION_TOKENS if t in o})
        md5_oracle = "md5(" in o
        long_oracle = len(oracle) >= 1200
        modeled = name in model_text
        # which model file(s) mention it, for the inventory
        model_files = sorted(
            os.path.basename(p)
            for p in glob.glob(
                os.path.join(os.path.dirname(__file__), "..", "tests", "test_*model*.py")
            )
            if name in open(p).read()
        )
        score = 2 * md5_oracle + len(tokens) + (1 if long_oracle else 0)
        if score > 0 or "--all" in sys.argv:
            rows.append(
                {
                    "name": name,
                    "score": score,
                    "md5": md5_oracle,
                    "len": len(oracle),
                    "tokens": tokens,
                    "modeled": modeled,
                    "model_files": model_files,
                }
            )

    rows.sort(key=lambda r: (-r["score"], r["name"]))
    uncovered = [r for r in rows if not r["modeled"]]
    print(f"| query | score | md5-oracle | oracle len | construction tokens | model |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        mf = ", ".join(f.replace("test_", "").replace("_model.py", "") for f in r["model_files"]) or "—"
        print(
            f"| {r['name']} | {r['score']} | {'Y' if r['md5'] else ''} | "
            f"{r['len']} | {' '.join(t.strip('( ') for t in r['tokens'])} | {mf} |"
        )
    print(f"\n{len(rows)} entries trip >=1 shared-construction signal; "
          f"{len(uncovered)} of them have NO model coverage:")
    for r in uncovered:
        print(f"  score {r['score']:2d}  {r['name']}")


if __name__ == "__main__":
    main()
