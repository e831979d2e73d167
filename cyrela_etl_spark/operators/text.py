"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen, no Python). Every operator is partition-parallel with
no driver-side collection, so the same plan runs on 500 rows or 100 TB.

Operators: tokenization, token counting, quality scoring
(length/punct/stopword ratios), n-gram heuristic language ID, and
deterministic document fingerprinting (portable md5-based rolling identity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cyrela_etl_spark.functions.hashing import stable_hash64

# Tiny high-frequency marker lists per language for the n-gram/stopword
# language-ID heuristic (public-knowledge function words).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}
# Deterministic tie-break: first language in this order wins ties.
LANG_ORDER: list[str] = ["en", "de", "es", "fr", "zh"]

STOPWORDS_EN: list[str] = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "was", "at", "by",
]

PUNCT_CLASS = r"[^.,!?;:]"  # keep-only-punct via regexp_replace of this class
TOKEN_SPLIT = r"\s+"


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace token count — the cheap proxy for LLM token budgeting."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-flavored token estimate: split on whitespace AND on
    letter/digit/punct boundaries (what a byte-pair tokenizer roughly does
    to code/numbers), still pure regex, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(F.lower(c), r"\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|(?=[^a-z0-9\s])")
    return F.size(F.filter(pieces, lambda t: t != F.lit("")))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, PUNCT_CLASS, ""))


def stopword_count(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def quality_columns(t: Column) -> dict[str, Column]:
    """The quality-feature expressions over a text column, as a name→Column
    dict so callers can take any subset in ONE projection (the curation
    pipeline composes these with language/fingerprint columns in a single
    corpus scan — no per-feature joins).

    All ratios are single double divisions of exact ints — bit-reproducible
    against any IEEE-754 oracle.
    """
    n_tok = token_count(t)
    n_chr = F.length(t)
    stop_ratio = stopword_count(t) / n_tok
    punct_ratio = punct_count(t) / n_chr
    length_sig = F.least(n_tok, F.lit(100)) / F.lit(100)
    stop_sig = F.least(stop_ratio * 4, F.lit(1.0))
    punct_sig = F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))
    return {
        "n_tokens": n_tok,
        "n_chars_measured": n_chr,
        "avg_token_len": F.length(F.regexp_replace(t, r"\s+", "")) / n_tok,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": (length_sig + stop_sig + punct_sig) / F.lit(3.0),
    }


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + a composite score in [0,1]:

    - ``n_tokens``, ``n_chars_measured``, ``avg_token_len``
    - ``punct_ratio``  (punctuation chars / chars)
    - ``stopword_ratio`` (stopword tokens / tokens)
    - ``quality_score`` = mean of three bounded signals: length signal
      (min(n_tokens,100)/100), stopword signal (min(ratio*4,1)), and
      1 - min(punct_ratio*10, 1)
    """
    cols = quality_columns(F.col(text_col))
    return df.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def language_scores(t: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over a text column
    (``score_en`` … ``score_zh``), one filter-HOF each."""
    tok = tokens(t)

    def _marker_hits(markers: list[str]):
        arr = F.array(*[F.lit(w) for w in markers])
        # NB: the closure must stay single-argument — PySpark infers lambda
        # arity from ALL positional params (defaults included).
        return F.size(F.filter(tok, lambda x: F.array_contains(arr, x)))

    return {f"score_{lang}": _marker_hits(LANG_MARKERS[lang]) for lang in LANG_ORDER}


def language_pred(scores: dict[str, Column]) -> Column:
    """Argmax language with fixed tie-break (LANG_ORDER), 'und' on zero
    hits. Takes the score columns as inputs so callers can materialize
    them in an inner projection first — the CASE references each score
    ~3×, and HOF score expressions are interpreted (no codegen CSE), so
    inlining them here would re-evaluate each tokenize+filter tree per
    reference. Pass column REFS for the cheap two-level plan."""
    best = F.greatest(*[scores[f"score_{lang}"] for lang in LANG_ORDER])
    pred = F.lit("und")
    # Build CASE from last to first so earlier languages win ties.
    for lang in reversed(LANG_ORDER):
        pred = F.when(scores[f"score_{lang}"] == best, F.lit(lang)).otherwise(pred)
    return F.when(best == 0, F.lit("und")).otherwise(pred)


def language_columns(t: Column) -> dict[str, Column]:
    """Language-ID expressions over a text column (``lang_pred`` plus the
    per-language marker-hit scores) — the single-projection form. For
    plans that keep the score columns anyway, prefer materializing
    ``language_scores`` first and applying ``language_pred`` to the refs.
    """
    scores = language_scores(t)
    return {"lang_pred": language_pred(scores), **scores}


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: count marker-word hits per language over
    the token array, argmax with fixed tie-break order (LANG_ORDER).

    This is the classic n-gram-profile heuristic (Cavnar & Trenkle 1994)
    reduced to word-unigram markers — deterministic, no model download.
    """
    cols = language_columns(F.col(text_col))
    return df.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic 60-bit content fingerprint over whitespace-normalized,
    lowercased text. Portable across engines (md5-based, see
    functions/hashing.py) — two documents share a fingerprint iff their
    normalized text is identical; the groupable identity used by exact dedup.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("content_md5"),
        stable_hash64(norm).alias("fingerprint64"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
    "Winnowing: local algorithms for document fingerprinting" — the MOSS
    algorithm): hash every k-gram, slide a window of ``window`` consecutive
    k-gram hashes, keep the minimum of each window, emit the distinct kept
    hashes. Guarantees any shared run of ≥ window+k-1 tokens between two
    documents shares a fingerprint, at ~2/(window+1) selection density.

    Pure per-row expression work (transform/slice/array_min over one
    md5-hash pass) — zero shuffles to fingerprint a corpus; output is the
    exploded long form (doc_id, fingerprint) for relational overlap joins.
    This is plain min-per-window (both engines break ties identically by
    VALUE, so no positional tie-break is needed for portability).
    """
    # Each stage is materialized as a COLUMN before the next references it:
    # HOF lambda bodies are opaque to Spark's subexpression elimination, so
    # an inline `hashes` expression referenced inside the per-window slice
    # would re-run the whole tokenize+md5 chain per window — measured ~50×
    # slower (same pitfall documented on the MinHash fold).
    tok_df = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    grams_df = tok_df.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("toks") - F.lit(k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, k)),
        ).alias("grams"),
    )
    hash_df = grams_df.select(
        "doc_id", F.transform("grams", lambda g: stable_hash64(g)).alias("hs")
    )
    kept = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("hs") - F.lit(window - 1), F.lit(1))),
            lambda i: F.array_min(F.slice(F.col("hs"), i, window)),
        )
    )
    return hash_df.select("doc_id", F.explode(kept).alias("fingerprint"))


def word_grams(col: Column | str, n: int = 2) -> Column:
    """NON-distinct word n-grams (array<string>) — the multiset variant of
    dedup.word_shingles, for frequency statistics where duplicate grams
    ARE the signal. Documents with fewer than n tokens yield the empty
    array (no whole-join fallback: a partial gram would pollute counts).
    Same shifted-``zip_with`` construction (O(n·len), no per-gram slice
    allocation, no HOF re-evaluation)."""
    c = F.col(col) if isinstance(col, str) else col
    tok = tokens(c)
    sz = F.size(tok)
    grams = tok
    for i in range(1, n):
        grams = F.zip_with(grams, F.slice(tok, i + 1, sz), lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(grams, 1, F.greatest(sz - F.lit(n - 1), F.lit(0)))


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Within-document repetition signals over word n-grams — the
    pretraining quality-filter family popularized by the Gopher data
    pipeline (Rae et al. 2021, "Scaling Language Models", Table A1:
    duplicate/top n-gram fractions): machine-generated and boilerplate
    text repeats itself far more than natural prose.

    Per document: total n-gram occurrences, the top n-gram's occurrence
    count, ``top_gram_frac`` (top count / total) and ``dup_gram_frac``
    (occurrences belonging to any gram seen ≥2× / total). Counts are
    exact ints; each fraction is one IEEE-754 division (bit-stable across
    engines). Documents with fewer than n tokens have ZERO grams and are
    ABSENT from the output (the explode emits no rows — identically on
    both engines via unnest), so every emitted denominator is ≥ 1 and
    the 0/0 edge (NULL with ANSI off, DIVIDE_BY_ZERO under ANSI — same
    as the dedup Jaccard) cannot arise; join back to the corpus on
    doc_id if a total relation is needed.

    Plan: explode → (doc, gram) hash-count → per-doc re-agg. Two
    shuffles, both with map-side partial aggregation; the (doc, gram)
    key is high-cardinality but unskewed (doc_id spreads any hot gram),
    so the shape is safe at corpus scale.
    """
    grams = df.select(F.col(id_col).alias("doc_id"), F.explode(word_grams(F.col(text_col), n)).alias("gram"))
    gc = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c")
    return (
        gc.groupBy("doc_id")
        .agg(
            total.cast("long").alias("n_grams"),
            F.max("c").cast("long").alias("top_gram_n"),
            (F.max("c") / total).alias("top_gram_frac"),
            (F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))) / total).alias(
                "dup_gram_frac"
            ),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram language-model quality score per document —
    the classic LM-based pretraining filter (CCNet / Wenzek et al. 2020
    score documents with a KenLM; here the LM is a bigram model trained on
    the corpus itself, and the score is kept in exact-integer space so it
    is bit-reproducible against any engine).

    Model: add-one-smoothed bigram probability with the prefix-occurrence
    normalizer, P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V). Instead of
    summing log-probs (transcendental, last-ulp-divergent across engines),
    each occurrence contributes floor(1e6 · P) — an exact BIGINT — and the
    document score is avg probability in ppm: one IEEE division of two
    exact ints at the very end. Monotone in corpus likelihood, no floats
    anywhere in the fold.

    Per document: ``n_bigrams``, ``sum_ppm``, ``avg_prob_ppm``. Documents
    with < 2 tokens have no bigrams and are absent (explode emits no rows).

    Plan (two passes over the token stream, all shuffles keyed well):
    1. occurrences (doc_id, bigram) — one explode projection;
    2. model = bigram counts ⋈ prefix counts (hash aggs with map-side
       combine; the prefix join is keyed on the bigram's first word);
    3. score = occurrences ⋈ model on bigram (shuffle hash join; the
       model is corpus-vocabulary-sized — broadcast it only for small
       corpora), + a 1-row vocab aggregate cross-joined (broadcast);
    4. per-doc sum/count hash agg.
    A hot bigram ("of the") skews the score join's build side uniformly,
    not a single reducer — the probe stream stays doc-partitioned.
    """
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_grams(F.col(text_col), 2)).alias("bg"),
    )
    c2 = occ.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        occ.select(F.split(F.col("bg"), " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = df.select(F.explode(tokens(F.col(text_col))).alias("tok")).agg(
        F.countDistinct("tok").alias("vocab")
    )
    model = c2.join(c1, F.split(c2["bg"], " ").getItem(0) == c1["w1"]).select("bg", "c2", "c1")
    scored = (
        occ.join(model, "bg")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr("(1000000 * (c2 + 1)) div (c1 + vocab)").alias("ppm"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("ppm").cast("long").alias("sum_ppm"),
        (F.sum("ppm") / F.count(F.lit(1))).alias("avg_prob_ppm"),
    )


# Fixed, versioned weights for the linear quality classifier — a stand-in
# for a trained fastText/logreg quality model's exported coefficients
# (model-based filtering à la GPT-3/CCNet; at inference time the model IS
# just a weight vector applied in one projection).
QUALITY_CLF_WEIGHTS: dict[str, float] = {
    "bias": -0.6,
    "length_sig": 0.9,
    "stopword_sig": 0.7,
    "punct_sig": 0.5,
}
QUALITY_CLF_THRESHOLD = 0.0


def quality_classifier(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Linear quality-classifier inference: margin = w·features + b over
    the three bounded quality signals, keep = margin > threshold.

    One JVM-side projection per document — no shuffle, no Python, no
    model server: exactly how a 100 TB keep/drop pass should run. The
    margin fold is a fixed left-to-right chain of literal-weight
    multiply-adds over signals built from exact ints, so any IEEE-754
    engine reproduces it bit-for-bit.

    Returns (doc_id, length_sig, stopword_sig, punct_sig, margin, keep).
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chr = F.length(t)
    length_sig = F.least(n_tok, F.lit(100)) / F.lit(100)
    stop_sig = F.least(stopword_count(t) / n_tok * 4, F.lit(1.0))
    punct_sig = F.lit(1.0) - F.least(punct_count(t) / n_chr * 10, F.lit(1.0))
    w = QUALITY_CLF_WEIGHTS
    base = df.select(
        F.col(id_col).alias("doc_id"),
        length_sig.alias("length_sig"),
        stop_sig.alias("stopword_sig"),
        punct_sig.alias("punct_sig"),
    )
    margin = (
        F.lit(w["bias"])
        + F.lit(w["length_sig"]) * F.col("length_sig")
        + F.lit(w["stopword_sig"]) * F.col("stopword_sig")
        + F.lit(w["punct_sig"]) * F.col("punct_sig")
    )
    return base.select(
        "doc_id",
        "length_sig",
        "stopword_sig",
        "punct_sig",
        margin.alias("margin"),
        (margin > F.lit(QUALITY_CLF_THRESHOLD)).alias("keep"),
    )


def bm25_lite_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k document retrieval for a bag of query terms with a BM25-shaped
    score kept entirely in exact integer arithmetic.

    Classic BM25 (k1=1.2, b=0.75) is sum_t idf(t) · tf·(k1+1) /
    (tf + k1·(1−b+b·dl/avgdl)). Two deterministic substitutions make it
    oracle-exact: the idf log is dropped (the RATIONAL Robertson argument
    (N−df+0.5)/(df+0.5) is used directly — a monotone transform per term,
    so single-term rankings are identical and multi-term rankings weight
    rare terms more sharply), and every per-term contribution is floored
    to ppm BIGINTs:

        contrib_ppm = (1e6 · (2N−2df+1) · 22·tf·L) //
                      ((2df+1) · (10·tf·L + 3·L + 9·dl·N))

    where L = total corpus tokens, avgdl = L/N, and the 22/10/3/9 factors
    are k1=6/5, b=3/4 cleared of denominators. Scores are exact BIGINT
    sums — bit-identical in any engine. The numerator (≤ 1e6·2N·22·tf·L)
    is carried as DECIMAL(38,0) on the Spark side — int64 wraps silently
    past N·tf·L ≈ 4e11 while DuckDB promotes to HUGEINT, which would be a
    silent large-SF divergence; decimal(38,0) is exact to ~1e38 and under
    ANSI mode overflow past that errors loudly instead of wrapping.

    Plan: tokenize → explode filtered TO THE QUERY TERMS (the filter sits
    under the first shuffle, so corpus-size work is one projection) →
    per-(doc,term) tf hash agg → broadcast join the |terms|-row df table +
    the 1-row (N, L) totals → per-doc sum → TakeOrdered top-k. No shuffle
    carries more than the matching postings.
    """
    term_arr = F.array(*[F.lit(t) for t in terms])
    toks = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t"))
    toks = toks.select("doc_id", F.col("t"), F.size("t").cast("long").alias("dl"))
    totals = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    occ = toks.select(
        "doc_id", "dl", F.explode("t").alias("term")
    ).filter(F.array_contains(term_arr, F.col("term")))
    tf = occ.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = occ.groupBy("term").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * (2*n_docs - 2*df + 1) * 22"
                " * tf * total_len) div "
                "((CAST(2 AS DECIMAL(38,0))*df + 1)"
                " * (10*tf*total_len + 3*total_len + 9*dl*n_docs)) AS BIGINT)"
            ).alias("contrib_ppm"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("contrib_ppm").cast("long").alias("score_ppm"),
    )
    top = per_doc.orderBy(F.col("score_ppm").desc(), F.col("doc_id").asc()).limit(k)
    from pyspark.sql import Window

    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score_ppm").desc(), F.col("doc_id").asc()))
        .cast("long"),
    ).select("doc_id", "rank", "n_terms", "score_ppm")
