"""Shared-construction-oracle sweep: enumerate registry entries whose
DuckDB oracle SHARES the engine's construction (VERDICT r15 item 4;
made evergreen in round 17 per VERDICT r16 item 4).

The oracle gate's one structural blind spot: when the oracle SQL
re-derives the result through the SAME nontrivial construction the
Spark code uses (the md5-prefix hash trick, the same blocking key, the
same neighborhood enumeration, a transliterated expression tree), a bug
in the shared construction passes both engines. Waves 3-6 addressed the
flagged entries with plain-Python models; this sweep makes the coverage
bookkeeping SYSTEMATIC so the remaining exposure is an explicit list,
not a guess — and (round 17) self-validating, so registry or model-file
drift surfaces as a reported issue instead of a silently wrong table.

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

Coverage for a flagged entry is one of:
  - `literal`: the query name appears (word-boundary exact — ADVICE r16:
    plain substring matching marked e.g. dedup_exact covered because
    "dedup_exact_pairs" contained it) in a tests/test_*model*.py file.
  - `mapped`: OPERATOR_COVERAGE names the model file(s) that certify
    the shared construction at OPERATOR level without spelling the
    query name (e.g. test_hash_model.py pins the simhash fold every
    simhash query shares).
  - `signal-fp`: SIGNAL_FALSE_POSITIVES records why the tripped signal
    is the query's SUBJECT or an independent spelling, not a leaked
    construction ('lambda' in func_hof is what the query tests).
  - `UNCOVERED`: none of the above — the wave-N work queue.

Self-validation (reported as `issues`, enforced by
tests/test_sweep_coverage.py):
  - a mapping/fp key not in the registry (registry drift);
  - a mapped model file that does not exist (model-file drift);
  - a mapped/fp entry whose name NOW matches literally (stale mapping —
    prune it so the table stays honest);
  - a mapped/fp entry that no longer trips any signal (stale row).

Usage: python tools/shared_construction_sweep.py [--all]
Exit status is nonzero when any entry is UNCOVERED or any issue exists.
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

# --- Explicit operator-level model coverage (VERDICT r16 item 4) -----------
# query name -> (model files csv, rationale). These entries trip >= 1
# shared-construction signal and have NO literal word-boundary mention in
# any model file, but the named model file(s) certify the SHARED
# CONSTRUCTION itself at operator level (the hand dispositions of NOTES
# rounds 16-17, now machine-checked: keys must exist in the registry,
# files must exist, and a key that gains a literal mention is flagged
# stale so the table cannot rot).
OPERATOR_COVERAGE: dict[str, tuple[str, str]] = {
    # hash-fingerprint dedup family: test_hash_model.py re-derives the
    # hex-prefix md5 base hash, minhash permutation fold (init/sentinel,
    # parameter progression), LSH band-key construction, simhash
    # per-occurrence votes and pigeonhole chunk buckets in plain Python.
    "dedup_simhash": ("test_hash_model.py", "simhash fold + fingerprint construction re-derived bit-faithfully"),
    "dedup_simhash_pairs": ("test_hash_model.py", "pigeonhole band/chunk buckets + exact Hamming verify re-derived"),
    "dedup_minhash_signatures": ("test_hash_model.py, test_minhash_sweep_model.py", "signature fold init/sentinel + permutation params re-derived"),
    "dedup_minhash_lsh": ("test_hash_model.py, test_minhash_sweep_model.py", "band-key construction and the band-intersect-Jaccard contract re-derived"),
    "dedup_exact": ("test_hash_model.py", "the hex-prefix md5 convention (functions/hashing.py) IS the shared construction; grouping on it is trivial"),
    "text_fingerprint": ("test_hash_model.py", "one md5/stable_hash64 over normalized text — the hash contract is the whole construction"),
    # components / graph family
    "dedup_components": ("test_graph_model.py, test_dedup_straggler_model.py", "pointer-doubling components checked against a union-find reference"),
    "graph_triangle_stats": ("test_graph_model.py", "triangle counts vs brute-force enumeration on random graphs"),
    "graph_pagerank": ("test_pagerank_lpa_model.py", "power iteration vs dense-matrix reference"),
    "graph_lpa_communities": ("test_pagerank_lpa_model.py", "label propagation re-derived round-by-round"),
    "graph_link_prediction": ("test_pagerank_lpa_model.py", "common-neighbor/Adamic-Adar scores re-derived from the raw edge set"),
    # contamination / corpus curation: test_corpus_model.py re-derives the
    # md5 hash-ranked selection layouts bit-faithfully.
    "dedup_contamination": ("test_contamination_model.py", "shingle-overlap contamination re-derived from raw text"),
    "corpus_chunking": ("test_corpus_model.py", "chunk-count/window layout re-derived (ceil floor rules incl. empty docs)"),
    "corpus_dataset_split": ("test_corpus_model.py", "md5-mod-100 bucket + threshold layout re-derived"),
    "corpus_token_pack": ("test_corpus_model.py", "shard/bin running-sum packing re-derived"),
    "corpus_stratified_sample": ("test_corpus_model.py", "per-stratum hash-rank + exact ceil cut re-derived"),
    "corpus_weighted_sample": ("test_corpus_model.py", "priority = hash div weight selection re-derived"),
    # text battery
    "text_winnow_fingerprints": ("test_text_model.py", "winnowing window-min + the Schleimer shared-run guarantee re-derived"),
    "text_repetition": ("test_text_model.py", "multiset word-gram counts + dup fractions re-derived"),
    "text_quality": ("test_langid_quality_model.py", "quality signal battery re-derived from raw text (wave-5 gate models transfer)"),
    "text_zipf_fit": ("test_text_straggler_model.py", "the shared split-regex tokenizer is pinned by the text_token_counts model there; the log-log OLS is independent arithmetic"),
    # bloom
    "scale_bloom_prefilter": ("test_bloom_model.py", "bit positions / double-hash family re-derived in plain ints"),
    # ANN ladder: quantizer training + assignment re-derived.
    "vector_ivf_topk": ("test_ivf_recall_model.py", "coarse-quantizer assignment + probe recall vs exact re-derived"),
    "vector_ivf_pq_topk": ("test_ivf_recall_model.py, test_quant_model.py", "IVF assignment + PQ codebook/ADC table re-derived"),
    "vector_pq_adc_topk": ("test_quant_model.py", "PQ codebook training + ADC distance table re-derived"),
    "vector_sq_int8_topk": ("test_quant_model.py", "scalar-quantization grid + reconstruction re-derived"),
    "vector_rhp_lsh_topk": ("test_vector_diag_model.py, test_vector_model.py, test_hash_model.py", "seed-pinned-planes-as-shared-constants protocol certified by the JL model; exact cosine re-rank by the cosine model; band-bucket mechanics by the LSH band-key model"),
    "vector_neardup_pairs": ("test_vector_model.py, test_feature_hash_semdedup_model.py", "exact cosine fold + near-dup pair semantics re-derived"),
    # temporal
    "temporal_gap_fill": ("test_asof_model.py", "per-key hourly spine (no global calendar) re-derived in Python"),
    "temporal_overlap_join": ("test_temporal_query_model.py", "the shared gap-rule sessionization is re-derived by the sessionize model; the least/greatest overlap predicate is the interval-algebra spec"),
}

# --- Signal false-positives ------------------------------------------------
# query name -> rationale. The keyword scan trips on something that is
# the query's SUBJECT or an independent spelling — there is no shared
# construction to model. Machine-checked the same way as
# OPERATOR_COVERAGE (registry membership, staleness).
SIGNAL_FALSE_POSITIVES: dict[str, str] = {
    "func_hof": "list_transform/lambda IS the query's subject (higher-order-function surface)",
    "func_maps": "map higher-order functions are the subject",
    "func_struct_ops": "struct/list transform surface is the subject",
    "func_bitwise": "bit_count/xor are the subject (bitwise function surface)",
    "sql_recursive_cte": "RECURSIVE is the subject; the CTE is an independent SQL spelling of the hierarchy walk",
    "multimodal_frame_sample": "unnest(range) enumerates frame indices — enumeration IS the spec; payload bytes independently certified by the container-validity spec parsers (test_media_container_validity.py)",
    "multimodal_byte_histogram": "unnest(range 0..255) enumerates the histogram domain — the spec; payloads certified by the container-validity parsers",
    "temporal_calendar_dim": "generate_series enumerates calendar days — one-row-per-day IS the spec; ISO fields pinned by test_round7_calendar_frames.py",
    "wallet_features": "the long oracle is DELIBERATELY the reference's 9-subquery SQL (the spec being matched, SURVEY §2); independently certified by the golden byte-match vs the reference's parsed-data.csv",
}


def _literal(name: str, text: str) -> bool:
    """Word-boundary-exact name match (ADVICE r16: `name in text` marked
    dedup_exact covered via dedup_exact_pairs). Underscores are name
    characters, so \\b alone is not enough — use explicit lookarounds."""
    return re.search(
        r"(?<![A-Za-z0-9_])" + re.escape(name) + r"(?![A-Za-z0-9_])", text
    ) is not None


def _model_files() -> dict[str, str]:
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    return {
        os.path.basename(p): open(p).read()
        for p in sorted(glob.glob(os.path.join(base, "test_*model*.py")))
    }


def sweep(registry: dict) -> tuple[list[dict], list[str]]:
    """Score every oracled registry entry; returns (rows, issues).

    rows: every entry tripping >= 1 signal, with fields name/score/md5/
    len/tokens/coverage/model_files/rationale, sorted score-desc.
    issues: self-validation failures (drift/staleness) — empty at a
    healthy HEAD; tests/test_sweep_coverage.py pins that.
    """
    model_files = _model_files()
    all_text = "\n".join(model_files.values())

    rows = []
    flagged_names = set()
    for name, (_fn, oracle) in registry.items():
        if oracle is None:
            continue
        o = oracle.lower()
        tokens = sorted({t for t in CONSTRUCTION_TOKENS if t in o})
        md5_oracle = "md5(" in o
        long_oracle = len(oracle) >= 1200
        score = 2 * md5_oracle + len(tokens) + (1 if long_oracle else 0)
        if score == 0:
            continue
        flagged_names.add(name)
        lit_files = sorted(f for f, t in model_files.items() if _literal(name, t))
        if lit_files:
            coverage, files, rationale = "literal", lit_files, ""
        elif name in OPERATOR_COVERAGE:
            csv, rationale = OPERATOR_COVERAGE[name]
            coverage, files = "mapped", [f.strip() for f in csv.split(",")]
        elif name in SIGNAL_FALSE_POSITIVES:
            coverage, files, rationale = "signal-fp", [], SIGNAL_FALSE_POSITIVES[name]
        else:
            coverage, files, rationale = "UNCOVERED", [], ""
        rows.append(
            {
                "name": name,
                "score": score,
                "md5": md5_oracle,
                "len": len(oracle),
                "tokens": tokens,
                "coverage": coverage,
                "model_files": files,
                "rationale": rationale,
            }
        )
    rows.sort(key=lambda r: (-r["score"], r["name"]))

    issues: list[str] = []
    for key in list(OPERATOR_COVERAGE) + list(SIGNAL_FALSE_POSITIVES):
        if key not in registry:
            issues.append(f"mapping key {key!r} is not a registry entry (registry drift)")
        elif key not in flagged_names:
            issues.append(f"mapping key {key!r} no longer trips any signal (stale row — prune it)")
        elif _literal(key, all_text):
            issues.append(f"mapping key {key!r} now has a literal model mention (stale mapping — prune it)")
    for key, (csv, _r) in OPERATOR_COVERAGE.items():
        for f in (x.strip() for x in csv.split(",")):
            if f not in model_files:
                issues.append(f"{key!r} maps to missing model file {f!r}")
    return rows, issues


def main() -> int:
    from cyrela_etl_spark.queries import load_all

    rows, issues = sweep(load_all())
    uncovered = [r for r in rows if r["coverage"] == "UNCOVERED"]
    print("| query | score | md5-oracle | oracle len | construction tokens | coverage | model / rationale |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        detail = ", ".join(
            f.replace("test_", "").replace("_model.py", "").replace(".py", "")
            for f in r["model_files"]
        ) or r["rationale"][:60]
        print(
            f"| {r['name']} | {r['score']} | {'Y' if r['md5'] else ''} | "
            f"{r['len']} | {' '.join(t.strip('( ') for t in r['tokens'])} | "
            f"{r['coverage']} | {detail} |"
        )
    n_lit = sum(r["coverage"] == "literal" for r in rows)
    n_map = sum(r["coverage"] == "mapped" for r in rows)
    n_fp = sum(r["coverage"] == "signal-fp" for r in rows)
    print(
        f"\n{len(rows)} entries trip >=1 shared-construction signal: "
        f"{n_lit} literal-modeled, {n_map} operator-level-mapped, "
        f"{n_fp} signal-false-positives, {len(uncovered)} UNCOVERED."
    )
    for r in uncovered:
        print(f"  UNCOVERED score {r['score']:2d}  {r['name']}")
    for i in issues:
        print(f"  ISSUE: {i}")
    return 1 if (uncovered or issues) else 0


if __name__ == "__main__":
    sys.exit(main())
