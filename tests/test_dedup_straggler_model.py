"""Model checks for the remaining dedup-family queries (dedup_keep_best,
dedup_containment_pairs, dedup_dup_ngram_fraction, dedup_impact_report) —
model-check wave 3.

keep_best reuses the Python duplicate-edge rebuild (md5 keys over the
planted corpus) with a union-find whose representative is the component
MINIMUM — independently checking the engine's min-propagation rounds AND
the longest-text/lowest-id survivor policy. Containment uses Python set
intersections over the rare-shingle candidate generator. The n-gram
fraction and impact report are Counter models with the exact ppm and
rounded-fraction arithmetic.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_CONT_DF_MIN, _CONT_DF_MAX, _CONT_N, _CONT_T = 2, 5, 3, 0.5


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _shingles(text: str, n: int) -> set[str]:
    toks = _toks(text)
    if not toks:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - (n - 1), 1))}


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _corpus_rows(sf_dir: str) -> list[tuple[int, str]]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    base = [(int(d), t) for d, t in docs.itertuples(index=False)]
    return (
        base
        + [(d + 100000, t) for d, t in base if d % 10 == 0]
        + [(d + 200000, t + " zyx extra") for d, t in base if d % 7 == 0]
    )


def test_keep_best_matches_union_find_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import dedup_keep_best

    got = {
        r["component"]: (r["n_members"], r["kept_id"], r["kept_len"])
        for r in dedup_keep_best(spark, sf_dir).collect()
    }
    rows = _corpus_rows(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo  # representative = component MINIMUM

    by_exact: dict[str, list[int]] = defaultdict(list)
    by_prefix: dict[str, list[int]] = defaultdict(list)
    for doc_id, text in rows:
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        by_exact[_md5(norm)].append(doc_id)
        by_prefix[_md5(" ".join(_toks(text)[:6]))].append(doc_id)
    for groups in (by_exact, by_prefix):
        for ids in groups.values():
            for other in ids[1:]:
                union(ids[0], other)
    comps: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for doc_id, text in rows:
        comps[find(doc_id)].append((len(text), -doc_id))
    want = {}
    for comp, members in comps.items():
        best_len, neg_id = max(members)
        want[comp] = (len(members), -neg_id, best_len)
    assert got == want


def test_containment_pairs_match_python_sets(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import dedup_containment_pairs

    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["containment_a"], r["containment_b"])
        for r in dedup_containment_pairs(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    sh = {int(r.doc_id): _shingles(r.text, _CONT_N) for r in docs.itertuples(index=False)}
    posting: dict[str, list[int]] = defaultdict(list)
    for doc_id, grams in sh.items():
        for g in grams:
            posting[g].append(doc_id)
    cand: set[tuple[int, int]] = set()
    for ids in posting.values():
        if _CONT_DF_MIN <= len(ids) <= _CONT_DF_MAX:
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    cand.add((a, b))
    want = {}
    for a, b in cand:
        if not sh[a] or not sh[b]:
            continue
        inter = len(sh[a] & sh[b])
        ca, cb = _round6(inter / len(sh[a])), _round6(inter / len(sh[b]))
        if max(ca, cb) >= _CONT_T:
            want[(a, b)] = (inter, ca, cb)
    assert got == want


def test_dup_ngram_fraction_matches_counter_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import dedup_dup_ngram_fraction

    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_fraction"])
        for r in dedup_dup_ngram_fraction(spark, sf_dir).collect()
    }
    rows = _corpus_rows(sf_dir)
    per: dict[int, Counter] = {}
    for doc_id, text in rows:
        toks = _toks(text)
        grams = Counter(
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        )
        if grams:
            per[doc_id] = grams
    gram_df: Counter = Counter()
    for grams in per.values():
        gram_df.update(grams.keys())
    want = {}
    for doc_id, grams in per.items():
        n = sum(grams.values())
        dup = sum(c for g, c in grams.items() if gram_df[g] > 1)
        want[doc_id] = (n, dup, _round6(dup / n))
    assert got == want


def test_impact_report_matches_counter_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import dedup_impact_report

    got = {
        r["source"]: (r["n_docs"], r["n_unique"], r["n_removed"], r["tokens_before"],
                      r["tokens_removed"], r["doc_removal_ppm"])
        for r in dedup_impact_report(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["source", "doc_id", "text"]]
    groups: dict[tuple[str, str], list[int]] = defaultdict(list)
    for r in docs.itertuples(index=False):
        norm = re.sub(r"\s+", " ", r.text.lower()).strip()
        groups[(r.source, _md5(norm))].append(len(_toks(r.text)))
    want: dict[str, list[int]] = {}
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for (src, _), toks in groups.items():
        a = agg[src]
        a[0] += len(toks)
        a[1] += 1
        a[2] += sum(toks)
        a[3] += max(toks)
    want = {
        src: (n_docs, n_uniq, n_docs - n_uniq, tok_all, tok_all - tok_keep,
              (1_000_000 * (n_docs - n_uniq)) // n_docs)
        for src, (n_docs, n_uniq, tok_all, tok_keep) in agg.items()
    }
    assert got == want
