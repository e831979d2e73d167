"""Model-check wave 5: plain-Python re-derivations for the top three
shared-construction oracles the systematic sweep surfaced
(tools/shared_construction_sweep.py, VERDICT r15 item 4; NOTES round-16
inventory).

Selection criterion (same as wave 4): the DuckDB oracle re-walks the
SAME nontrivial construction the engine uses, so a bug in the shared
construction passes the oracle gate on both engines. The models here
re-derive each result from the RAW parquet rows with stdlib Python only
— no Spark expressions, no SQL, no shared helper code:

- quality_filter_agreement: its oracle NESTS the registered SQL of both
  gate queries (quality_gopher_rules, quality_classifier_filter) as
  derived tables — by design the matrix can never drift from the gates,
  which also means it can never catch a bug IN the gates. The model
  recomputes every Gopher rule (token counts, integer-milli mean word
  length, alpha fraction, stopword hits) and the classifier's
  three-signal IEEE margin chain per document, then the 2x2 matrix +
  exact ppm shares.
- storage_integrity_checksum: engine and oracle share the whole
  row-fingerprint chain (concat_ws row repr, decimal(12,2) string form,
  md5 15-hex-prefix long, bit_xor fold). The model rebuilds the chain
  with hashlib + decimal.Decimal(repr(x)).quantize(HALF_UP) — the
  pinned Spark-double→decimal convention — and folds xor in plain ints.
- text_ngram_novelty: engine and oracle share the tokenize + distinct
  3-gram shingle construction (word_shingles / sql_shingles, including
  the short-document whole-join rule). The model re-derives shingles
  from re.split + list slices and the first-seen attribution by a dict
  scan in doc_id order.

IEEE / integer conventions relied on (the wave-3 pinned set): Spark's
`x div y` on positive BIGINTs == Python `//`; int/int `/` is one
binary64 division == Python `/`; a literal-weight multiply-add chain is
evaluated left-to-right in both; Spark CAST(double AS DECIMAL(12,2)) ==
Decimal(repr(x)).quantize(Decimal('0.01'), ROUND_HALF_UP).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

# --- shared raw-text primitives (re-derived, not imported) -----------------

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "was", "at", "by",
]
PUNCT_CHARS = ".,!?;:"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def _shingles3(text: str) -> list[str]:
    """word_shingles(text, n=3) re-derived: distinct word trigrams; a
    document shorter than 3 tokens yields its whole token join as ONE
    shingle; zero tokens yield the empty list."""
    toks = _tokens(text)
    if not toks:
        return []
    if len(toks) <= 2:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    seen: set[str] = set()
    out: list[str] = []
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )


# --- 1. quality_filter_agreement -------------------------------------------


def _gopher_keep(text: str) -> bool | None:
    """quality_gopher_rules' keep, re-derived per document; None when the
    document is tokenless (both engines exclude it before the rules)."""
    toks = _tokens(text)
    n_words = len(toks)
    if n_words == 0:
        return None
    sum_len = sum(len(t) for t in toks)
    mwl_milli = (1000 * sum_len) // n_words
    n_alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
    n_stop = sum(1 for t in toks if t in STOPWORDS_EN)
    return (
        n_words >= 50
        and n_words <= 100000
        and 3000 <= mwl_milli <= 10000
        and n_alpha * 10 >= n_words * 8
        and n_stop >= 2
    )


def _clf_keep(text: str) -> bool | None:
    """quality_classifier_filter's keep: the exact three-signal margin
    chain (bias + w1*length + w2*stop + w3*punct, left-to-right binary64)
    over signals built from exact ints."""
    toks = _tokens(text)
    n_tok = len(toks)
    n_chr = len(text)
    if n_tok == 0 or n_chr == 0:
        return None  # null-margin docs never survive the agreement join
    length_sig = min(n_tok, 100) / 100
    stop_sig = min(sum(1 for t in toks if t in STOPWORDS_EN) / n_tok * 4, 1.0)
    n_punct = sum(1 for ch in text if ch in PUNCT_CHARS)
    punct_sig = 1.0 - min(n_punct / n_chr * 10, 1.0)
    margin = -0.6 + 0.9 * length_sig + 0.7 * stop_sig + 0.5 * punct_sig
    return margin > 0.0


def test_quality_filter_agreement_matches_raw_rederivation(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import quality_filter_agreement

    cells: Counter = Counter()
    for r in _docs(spark, sf_dir):
        gk = _gopher_keep(r["text"])
        ck = _clf_keep(r["text"])
        if gk is None or ck is None:
            continue  # dropped by the inner join on doc_id
        cells[(gk, ck)] += 1
    total = sum(cells.values())
    expected = {
        (gk, ck): (n, (1000000 * n) // total) for (gk, ck), n in cells.items()
    }

    got = {
        (r["gopher_keep"], r["clf_keep"]): (r["n_docs"], r["share_ppm"])
        for r in quality_filter_agreement(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(n for n, _ in got.values()) == total


# --- 2. storage_integrity_checksum -----------------------------------------


def test_storage_integrity_checksum_matches_hashlib_fold(spark, sf_dir):
    from cyrela_etl_spark.queries.storageq import storage_integrity_checksum

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .collect()
    )
    agg: dict[str, dict] = {}
    for r in rows:
        price = str(
            Decimal(repr(r["o_totalprice"])).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
        )
        s = f"{r['o_orderkey']}|{r['o_custkey']}|{price}|{r['o_orderpriority']}"
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        a = agg.setdefault(
            r["o_orderstatus"],
            {"n": 0, "xor": 0, "mn": r["o_orderkey"], "mx": r["o_orderkey"]},
        )
        a["n"] += 1
        a["xor"] ^= h
        a["mn"] = min(a["mn"], r["o_orderkey"])
        a["mx"] = max(a["mx"], r["o_orderkey"])

    got = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_digest"], r["min_key"], r["max_key"])
        for r in storage_integrity_checksum(spark, sf_dir).collect()
    }
    expected = {k: (v["n"], v["xor"], v["mn"], v["mx"]) for k, v in agg.items()}
    assert got == expected


# --- 4. corpus_quality_ablation (wave-5 extension) ---------------------------
# Same Gopher construction as quality_filter_agreement, transliterated
# into the oracle — the gate re-derivation above transfers: recompute
# every rule flag per document, then the per-rule fail / fail-only
# matrix the ablation reports.


def _gopher_flags(text: str) -> tuple[int, int, int, int, int] | None:
    toks = _tokens(text)
    n_words = len(toks)
    if n_words == 0:
        return None
    sum_len = sum(len(t) for t in toks)
    mwl_milli = (1000 * sum_len) // n_words
    n_alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
    n_stop = sum(1 for t in toks if t in STOPWORDS_EN)
    return (
        int(not n_words >= 50),
        int(not n_words <= 100000),
        int(not 3000 <= mwl_milli <= 10000),
        int(not n_alpha * 10 >= n_words * 8),
        int(not n_stop >= 2),
    )


def test_corpus_quality_ablation_matches_raw_rederivation(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import corpus_quality_ablation

    rules = ["min_words", "max_words", "word_len", "alpha", "stop"]
    n_docs = 0
    n_failed = [0] * 5
    n_failed_only = [0] * 5
    for r in _docs(spark, sf_dir):
        flags = _gopher_flags(r["text"])
        if flags is None:
            continue
        n_docs += 1
        tot = sum(flags)
        for i, f in enumerate(flags):
            n_failed[i] += f
            if f == 1 and tot == 1:
                n_failed_only[i] += 1
    expected = {
        rules[i]: (n_failed[i], n_failed_only[i], n_docs, n_failed[i] / n_docs)
        for i in range(5)
    }

    got = {
        r["rule"]: (r["n_failed"], r["n_failed_only"], r["n_docs"], r["removed_share"])
        for r in corpus_quality_ablation(spark, sf_dir).collect()
    }
    assert got == expected


# --- 5. storage_csv_dialect (wave-5 extension) -------------------------------
# The registered query's engine leg and oracle share two constructions:
# the hostile-payload expression + md5-prefix digest (modeled below with
# hashlib/string ops), and — the deeper one — the CSV dialect itself:
# BOTH the Spark writer and the Spark reader are configured escape='"',
# so a symmetric dialect misunderstanding could roundtrip cleanly inside
# Spark while producing files no one else can read. The cross-parser leg
# certifies the written BYTES against stdlib csv (an independent
# RFC-4180 implementation): Spark-write -> csv.reader must reproduce the
# exact payload multiset.


def _hostile_rows(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .collect()
    )
    return [
        (
            r["o_orderkey"],
            r["o_orderstatus"],
            f'a,"b\n{r["o_orderpriority"]}",{r["o_orderkey"]}',
        )
        for r in rows
    ]


def test_storage_csv_dialect_aggregate_matches_hashlib_fold(spark, sf_dir):
    from cyrela_etl_spark.queries.storageq import storage_csv_dialect

    agg: dict[str, dict] = {}
    for key, status, payload in _hostile_rows(spark, sf_dir):
        h = int(hashlib.md5(payload.encode()).hexdigest()[:15], 16)
        a = agg.setdefault(status, {"n": 0, "xor": 0, "mn": key})
        a["n"] += 1
        a["xor"] ^= h
        a["mn"] = min(a["mn"], key)
    expected = {k: (v["n"], v["xor"], v["mn"]) for k, v in agg.items()}

    got = {
        r["o_orderstatus"]: (r["n_rows"], r["payload_digest"], r["min_key"])
        for r in storage_csv_dialect(spark, sf_dir).collect()
    }
    assert got == expected


# --- 6. scale_partition_balance (wave-5 extension) ---------------------------
# Engine and oracle share the 60-bit md5-prefix bucket construction; the
# model rebuilds buckets with hashlib and the balance arithmetic with
# plain ints + the pinned Decimal HALF_UP spelling of Spark round().


def test_scale_partition_balance_matches_hashlib_buckets(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import scale_partition_balance

    keys = [
        r["o_custkey"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .collect()
    ]
    hist: Counter = Counter(
        int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 32 for k in keys
    )
    total = sum(hist.values())
    expected = {
        b: (
            n,
            float(
                Decimal(repr(n * 32 / total)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            ),
        )
        for b, n in hist.items()
    }

    got = {
        r["bucket"]: (r["n_rows"], r["load_ratio"])
        for r in scale_partition_balance(spark, sf_dir).collect()
    }
    assert got == expected


# --- 7. multimodal_duplicate_assets (wave-5 extension) -----------------------
# md5-of-payload is the query's SPEC, but engine (md5 over the UTF-8
# BINARY) and oracle (md5 over the source text) still share the planted
# corpus construction and the byte/char length conflation risk
# (strlen vs F.length(binary)); the model rebuilds the planted corpus
# and hashes real encoded bytes with hashlib.


def test_multimodal_duplicate_assets_matches_hashlib_groups(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import multimodal_duplicate_assets

    docs = _docs(spark, sf_dir)
    corpus = [(r["doc_id"], r["text"]) for r in docs]
    corpus += [(d + 100000, t) for d, t in corpus[: len(docs)] if d % 10 == 0]
    corpus += [
        (d + 200000, t + " zyx extra") for d, t in corpus[: len(docs)] if d % 7 == 0
    ]
    groups: dict[tuple[str, int], list[int]] = {}
    for doc_id, text in corpus:
        payload = text.encode("utf-8")
        key = (hashlib.md5(payload).hexdigest(), len(payload))
        groups.setdefault(key, []).append(doc_id)
    expected = {
        (h, nb): (len(ids), min(ids), (len(ids) - 1) * nb)
        for (h, nb), ids in groups.items()
        if len(ids) > 1
    }

    got = {
        (r["content_md5"], r["n_bytes"]): (
            r["n_copies"],
            r["canonical_id"],
            r["wasted_bytes"],
        )
        for r in multimodal_duplicate_assets(spark, sf_dir).collect()
    }
    assert got == expected


def test_spark_csv_writer_bytes_parse_under_stdlib_rfc4180(spark, sf_dir, tmp_path):
    import csv
    import glob as _glob

    from pyspark.sql import functions as F

    expected = Counter(_hostile_rows(spark, sf_dir))

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    payload = F.concat(
        F.lit('a,"b'),
        F.lit("\n"),
        F.col("o_orderpriority"),
        F.lit('",'),
        F.col("o_orderkey").cast("string"),
    )
    hostile = orders.select("o_orderkey", "o_orderstatus", payload.alias("payload"))
    out = str(tmp_path / "orders_csv")
    hostile.write.option("header", True).option("quoteAll", True).option(
        "escape", '"'
    ).mode("overwrite").csv(out)

    got: Counter = Counter()
    for part in _glob.glob(f"{out}/part-*.csv"):
        with open(part, newline="") as fh:
            reader = csv.reader(fh)  # stdlib default IS RFC 4180 doubling
            header = next(reader)
            assert header == ["o_orderkey", "o_orderstatus", "payload"]
            for rec in reader:
                got[(int(rec[0]), rec[1], rec[2])] += 1
    assert got == expected


def test_text_ngram_novelty_matches_bruteforce_first_seen(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_ngram_novelty

    shingles_by_doc = {
        r["doc_id"]: _shingles3(r["text"]) for r in _docs(spark, sf_dir)
    }
    first: dict[str, int] = {}
    for doc_id in sorted(shingles_by_doc):
        for g in shingles_by_doc[doc_id]:
            if g not in first or doc_id < first[g]:
                first[g] = doc_id
    expected = {}
    for doc_id, grams in shingles_by_doc.items():
        if not grams:
            continue  # empty shingle arrays explode to no posting rows
        n_grams = len(grams)
        n_first = sum(1 for g in grams if first[g] == doc_id)
        expected[doc_id] = (n_grams, n_first, (1000000 * n_first) // n_grams)

    got = {
        r["doc_id"]: (r["n_grams"], r["n_first"], r["novelty_ppm"])
        for r in text_ngram_novelty(spark, sf_dir).collect()
    }
    assert got == expected
