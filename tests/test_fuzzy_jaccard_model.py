"""Model-check wave 4: brute-force plain-Python re-derivations for the
fuzzy-match and blocked-Jaccard families (queries/relational.py,
queries/textq.py + operators/dedup.py).

Why these: their DuckDB oracles are the SAME blocking construction
spelled in SQL (masked-variant / deletion-neighborhood / prefix-block
joins), so a bug in the construction itself — an off-by-one in the mask
positions, an incomplete deletion neighborhood — would pass the oracle
gate on both engines. The models here make no blocking assumption at
all: they enumerate ALL pairs and verify the blocked results equal the
brute-force ground truth, certifying the neighborhood-completeness
theorems the constructions rely on:

- substitution blocking: two distinct same-length names share a masked
  variant at position p iff they differ exactly at p (=> Levenshtein 1);
- SymSpell deletion blocking: lev(a,b) <= 1 iff a and b share a string
  in {self} ∪ {single-char deletions};
- prefix-blocked n-gram Jaccard: within-block pairs at threshold equal
  the brute-force same-block pairs, with the Jaccard double reproduced
  bit-exactly (one IEEE division of two small ints).
"""

from __future__ import annotations

from collections import Counter


def _lev(a: str, b: str) -> int:
    """Plain DP Levenshtein (unit costs) — the reference predicate."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expand_to_record_pairs(name_pairs, by_name):
    """(name_a, name_b, d) name pairs + identical-name groups -> the
    record-pair relation both queries emit: cross pairs keyed
    least/greatest, plus distance-0 within-group pairs."""
    out = []
    for na, nb, d in name_pairs:
        for ka in by_name[na]:
            for kb in by_name[nb]:
                out.append((min(ka, kb), max(ka, kb), d))
    for _name, keys in by_name.items():
        ks = sorted(keys)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                out.append((ks[i], ks[j], 0))
    return Counter(out)


def _customers(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name")
        .collect()
    )
    by_name: dict[str, list[int]] = {}
    for r in rows:
        if len(r["c_name"]) >= 1:
            by_name.setdefault(r["c_name"], []).append(r["c_custkey"])
    return by_name


def test_fuzzy_match_names_matches_bruteforce_model(spark, sf_dir):
    """Substitution variant: brute force = all distinct same-length name
    pairs at Hamming distance exactly 1 (the only way same-length strings
    reach Levenshtein 1)."""
    from cyrela_etl_spark.queries.relational import fuzzy_match_names

    by_name = _customers(spark, sf_dir)
    names = sorted(by_name)
    name_pairs = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            if len(a) == len(b) and sum(x != y for x, y in zip(a, b)) == 1:
                name_pairs.append((a, b, 1))
    want = _expand_to_record_pairs(name_pairs, by_name)

    got = Counter(
        (r["id_a"], r["id_b"], r["edit_distance"])
        for r in fuzzy_match_names(spark, sf_dir).collect()
    )
    assert got == want
    assert sum(1 for (_a, _b, d) in got if d == 1) > 0, "corpus has no planted pairs?"


def test_fuzzy_match_names_indel_matches_bruteforce_model(spark, sf_dir):
    """Indel variant: brute force = all distinct name pairs (ANY lengths)
    at full Levenshtein distance <= 1 — certifies the SymSpell deletion
    neighborhood catches insertions/deletions, not just substitutions."""
    from cyrela_etl_spark.queries.relational import fuzzy_match_names_indel

    by_name = _customers(spark, sf_dir)
    names = sorted(by_name)
    name_pairs = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            if abs(len(a) - len(b)) <= 1 and _lev(a, b) <= 1:
                name_pairs.append((a, b, _lev(a, b)))
    want = _expand_to_record_pairs(name_pairs, by_name)

    got = Counter(
        (r["id_a"], r["id_b"], r["edit_distance"])
        for r in fuzzy_match_names_indel(spark, sf_dir).collect()
    )
    assert got == want


def test_dedup_ngram_jaccard_matches_bruteforce_model(spark, sf_dir):
    """Prefix-blocked 3-gram Jaccard over the planted corpus: the model
    re-derives the corpus planting (exact copies at +100000 for
    doc_id%10==0, ' zyx extra'-suffixed near-dups at +200000 for
    doc_id%7==0), tokenization (lowercase, \\s+ split, empties dropped),
    distinct 3-gram shingles (short docs yield their whole token join,
    zero-token docs are excluded), the md5 first-4-token block key, and
    the Jaccard as ONE IEEE division of two ints — compared bit-exactly
    against the Spark result."""
    import hashlib
    import re

    from cyrela_etl_spark.queries.textq import dedup_ngram_jaccard

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    docs = [(r["doc_id"], r["text"]) for r in rows]
    corpus = list(docs)
    corpus += [(i + 100000, t) for i, t in docs if i % 10 == 0]
    corpus += [(i + 200000, t + " zyx extra") for i, t in docs if i % 7 == 0]

    def toks(text: str) -> list[str]:
        return [t for t in re.split(r"\s+", text.lower()) if t != ""]

    def shingles(tok: list[str], n: int = 3):
        if not tok:
            return None  # zero-token docs excluded from pairing
        if len(tok) < n:
            return frozenset([" ".join(tok)])
        return frozenset(" ".join(tok[i : i + n]) for i in range(len(tok) - n + 1))

    sh = []
    for i, t in corpus:
        s = shingles(toks(t))
        if s is not None:
            blk = hashlib.md5(" ".join(toks(t)[:4]).encode()).hexdigest()
            sh.append((i, blk, s))
    sh.sort()
    want = Counter()
    for x in range(len(sh)):
        for y in range(x + 1, len(sh)):
            ia, ba, sa = sh[x]
            ib, bb, sb = sh[y]
            if ba != bb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            j = inter / union  # one IEEE division, same as Spark's int/int
            if j >= 0.8:
                want[(ia, ib, j)] += 1

    got = Counter(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    )
    assert got == want
    assert len(got) > 0, "planted corpus must produce near-dup pairs"
