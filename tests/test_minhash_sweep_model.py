"""Model checks for the MinHash tuning sweeps (dedup_minhash_calibration,
dedup_shingle_size_sensitivity) — model-check wave 3. The operator-level
signature model (tests/test_hash_model.py) is composed at query level:
signatures and exact Jaccards recomputed with hashlib over the planted
corpus's deterministic candidate pairs (exact / near / control), and the
shingle-width sweep's vocabulary / shared-shingle / candidate-pair
counts rebuilt per n.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd

from cyrela_etl_spark.functions.hashing import MERSENNE_PRIME as P
from cyrela_etl_spark.operators.dedup import minhash_params

_NUM_HASHES, _SHINGLE_N = 16, 3


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _shingles(text: str, n: int) -> set[str]:
    toks = _toks(text)
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _signature(text: str) -> list[int]:
    params = minhash_params(_NUM_HASHES)
    sig = [P] * _NUM_HASHES
    for sh in _shingles(text, _SHINGLE_N):
        h = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % P
        for i, (a, b) in enumerate(params):
            sig[i] = min(sig[i], (h * a + b) % P)
    return sig


def _corpus_rows(sf_dir: str) -> dict[int, str]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    base = [(int(d), t) for d, t in docs.itertuples(index=False)]
    rows = dict(base)
    rows.update({d + 100000: t for d, t in base if d % 10 == 0})
    rows.update({d + 200000: t + " zyx extra" for d, t in base if d % 7 == 0})
    return rows


def test_minhash_calibration_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import dedup_minhash_calibration

    got = {
        (r["id_a"], r["id_b"]): (r["pair_kind"], r["sig_matches"], r["est_ppm"],
                                 r["exact_ppm"], r["err_ppm"])
        for r in dedup_minhash_calibration(spark, sf_dir).collect()
    }
    rows = _corpus_rows(sf_dir)
    cand = (
        [(d, d + 100000, "planted_exact") for d in rows if d < 100000 and d % 10 == 0]
        + [(d, d + 200000, "planted_near") for d in rows if d < 100000 and d % 7 == 0]
        + [(d, d + 1, "control") for d in rows if d < 100000 and d % 13 == 0]
    )
    want = {}
    for a, b, kind in cand:
        sh_a, sh_b = _shingles(rows[a], _SHINGLE_N), _shingles(rows.get(b, ""), _SHINGLE_N)
        if b not in rows or not sh_a or not sh_b:
            continue  # inner joins drop absent/zero-shingle sides
        sig_a, sig_b = _signature(rows[a]), _signature(rows[b])
        m = sum(1 for x, y in zip(sig_a, sig_b) if x == y)
        est = (1_000_000 * m) // _NUM_HASHES
        exact = (1_000_000 * len(sh_a & sh_b)) // len(sh_a | sh_b)
        want[(a, b)] = (kind, m, est, exact, abs(est - exact))
    assert got == want


def test_shingle_size_sensitivity_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import dedup_shingle_size_sensitivity

    got = {
        r["shingle_n"]: (r["n_distinct_shingles"], r["n_shared"], r["n_candidate_pairs"])
        for r in dedup_shingle_size_sensitivity(spark, sf_dir).collect()
    }
    rows = _corpus_rows(sf_dir)
    want = {}
    for n in (2, 3, 4):
        df: Counter = Counter()
        for text in rows.values():
            df.update(_shingles(text, n))
        want[n] = (
            len(df),
            sum(1 for c in df.values() if c > 1),
            sum(c * (c - 1) // 2 for c in df.values()),
        )
    assert got == want
