"""Corpus-preparation operators for LLM training-data pipelines: document
chunking, deterministic dataset splits, PII redaction, and token-budget
packing.

All hot paths are built-in expressions (JVM-side, codegen) — no Python in
any per-row path. Determinism: every derived id/assignment is md5-based
(functions/hashing.py portability contract), every count is exact-integer,
so any SQL engine can replay the outputs bit-for-bit.

Scale notes:
- ``chunk_documents`` is a generator expansion (posexplode) — per-row,
  no shuffle; output rows ≈ total_tokens / step.
- ``dataset_split`` is a pure projection (hash mod 100) — the split is a
  *property* of the row, so adding data never reshuffles prior splits.
- ``redact_pii`` is regexp work in one projection.
- ``pack_token_budget`` needs a running sum per shard; sharding first
  (hash of doc id) keeps every window partition-local and bounded — a
  single global cumsum would funnel the corpus through one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cyrela_etl_spark.operators.text import token_count, tokens


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the unit of
    LLM pretraining ingestion. Chunk i covers tokens
    ``[i·step, i·step + chunk_size)`` with ``step = chunk_size − overlap``;
    every document yields ≥ 1 chunk (short docs → one short chunk).

    Output: (doc_id, chunk_index, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    step = chunk_size - overlap
    tok = tokens(F.col(text_col))
    n = F.size(tok)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(step)), F.lit(1)).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    with_tok = df.select(F.col(id_col), tok.alias("__tok"), starts.alias("__starts"))
    exploded = with_tok.select(
        id_col, "__tok", F.posexplode("__starts").alias("chunk_index", "__i")
    )
    piece = F.slice(F.col("__tok"), F.col("__i") * step + 1, chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_index"),
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-free id hash:
    ``pmod(md5-hash(id), 100)`` buckets → train < train_pct ≤ val <
    train_pct+val_pct ≤ test. Stable under corpus growth (a document's
    split never changes when others are added) — the property that keeps
    eval sets uncontaminated across dataset versions."""
    from cyrela_etl_spark.functions.hashing import stable_hash64

    bucket = F.pmod(stable_hash64(F.col(id_col).cast("string")), F.lit(100))
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(F.col(id_col), bucket.cast("int").alias("bucket"), split.alias("split"))


# Redaction patterns: RE2-compatible (no lookaround) so Java and DuckDB
# agree byte-for-byte. Email, then international-ish phone runs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    replacement: str = "[PII]",
) -> DataFrame:
    """Scrub emails/phone-shaped spans; emits per-kind match counts so a
    curation run can audit redaction rates. One projection, all regexp —
    no Python, no shuffle."""
    out = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(F.size(F.regexp_extract_all(out, F.lit(pat), F.lit(0))).alias(f"n_{kind}"))
        out = F.regexp_replace(out, pat, replacement)
    return df.select(F.col(id_col), *counts, out.alias("redacted_text"))


def pack_token_budget(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to contiguous token-budget bins (context-window
    packing): within a shard, docs in id order fill bin k over the token
    ranges ``[k·budget, (k+1)·budget)`` — ``bin_id = floor((cumsum −
    n_tokens) / budget)``, i.e. a doc lands in the bin where its first
    token falls (boundary docs straddle into the next range; exact no-split
    packing is a sequential decision chain, deliberately not emulated).

    Sharding by id hash keeps the running sum partition-local: each shard
    packs independently in parallel — the scale-true layout (global
    packing order across 100 TB would serialize through one reducer) at
    the cost of ≤ n_shards partially-filled final bins.
    """
    from cyrela_etl_spark.functions.hashing import stable_hash64

    n_tok = token_count(F.col(text_col))
    shard = F.pmod(stable_hash64(F.col(id_col).cast("string")), F.lit(n_shards))
    base = df.select(
        F.col(id_col), shard.cast("int").alias("shard"), n_tok.cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("shard").orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("n_tokens").over(w)
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("bin_id"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    keep_pct: int = 20,
) -> DataFrame:
    """Deterministic EXACT-fraction stratified sampling: within each
    stratum, rank documents by content-free id hash and keep the first
    ``ceil(n_stratum * keep_pct/100)`` — every stratum contributes its
    exact proportion (a Bernoulli `sample()` only hits the rate in
    expectation, and is not reproducible across engines). One shuffle on
    the stratum key; selection is stable for a FIXED corpus snapshot
    (rank-based selection shifts as a stratum grows — for growth-stable
    per-document assignment use ``dataset_split``'s hash buckets).

    The training-data use: downsampling over-represented
    languages/sources to a mixture profile while keeping runs exactly
    reproducible.
    """
    from pyspark.sql import Window

    from cyrela_etl_spark.functions.hashing import stable_hash64

    h = stable_hash64(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col)
    wo = w.orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(id_col),
        F.col(stratum_col),
        F.row_number().over(wo).alias("h_rank"),
        F.count(F.lit(1)).over(w).alias("n_stratum"),
    )
    keep_n = F.ceil(F.col("n_stratum") * keep_pct / 100)
    return (
        ranked.filter(F.col("h_rank") <= keep_n)
        .select(id_col, stratum_col, F.col("h_rank").cast("long").alias("h_rank"))
    )


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the n
    documents with the smallest priority = hash(id) // weight (integer
    division of the content-free 60-bit id hash by a positive integer
    weight — Duffield/Lund/Thorup priority sampling with the uniform
    replaced by a portable hash). A document with weight w is selected
    with probability ≈ proportional to w, the choice is a pure function
    of (id, weight) — reruns and engines agree bit-for-bit — and unlike
    rand()-based sampling it is joinable: the same ids are kept on every
    cluster.

    The training-data use: quality- or recency-weighted corpus
    subsampling ("sample 1M docs ∝ quality_score") with exact
    reproducibility for ablations.

    Plan: one projection + TakeOrdered(n) — no global sort, no shuffle
    beyond the per-partition top-n merge. Weights must be positive ints
    (scale float weights to ppm upstream).
    """
    from pyspark.sql import Window

    from cyrela_etl_spark.functions.hashing import stable_hash64

    pri = F.expr(f"__h div {weight_col}")
    base = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias(weight_col),
        stable_hash64(F.col(id_col).cast("string")).alias("__h"),
    ).select(F.col(id_col), F.col(weight_col), pri.alias("priority"))
    top = base.orderBy(F.col("priority").asc(), F.col(id_col).asc()).limit(n)
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("priority").asc(), F.col(id_col).asc()))
        .cast("long"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_line_doc_ratio: float = 0.3,
    min_docs_with_line: int = 2,
) -> DataFrame:
    """CCNet-style boilerplate removal: a LINE that appears in more than
    ``max_line_doc_ratio`` of the documents of its group (site/source) is
    boilerplate — cookie banners, nav menus, subscribe footers — and is
    stripped from every document (Wenzek et al. 2020 dedup lines across
    shards for exactly this reason; Dolma/RefinedWeb keep a per-site
    variant).

    Returns (doc_id, group, text_clean, n_lines, n_lines_removed) with
    line order preserved. ``min_docs_with_line`` (default 2) keeps the
    ratio test meaningful for tiny groups — in a one-document group EVERY
    line trivially hits 100% document frequency and the whole document
    would vanish.

    Plan: posexplode lines → line-hash × group doc-frequency hash agg →
    broadcast-join the (small) boilerplate line set back → re-assemble via
    array_sort(collect_list(struct(pos, line))) — deterministic order
    restoration without a window sort. Two shuffles (line-DF agg, per-doc
    regroup), both keyed and combinable map-side; the boilerplate set is
    frequent-by-definition, hence tiny relative to the corpus.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    docs_per_group = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    line_df = (
        lines.groupBy("grp", "line")
        .agg(F.countDistinct("doc_id").alias("n_docs_with_line"))
        .join(docs_per_group, "grp")
        .filter(
            (F.col("n_docs_with_line") >= min_docs_with_line)
            & (F.col("n_docs_with_line") / F.col("n_docs") > max_line_doc_ratio)
        )
        .select("grp", "line", F.lit(True).alias("is_boiler"))
    )
    marked = lines.join(F.broadcast(line_df), ["grp", "line"], "left")
    kept = marked.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).cast("long").alias("n_lines_removed"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("is_boiler").isNull(), F.struct("pos", "line"))
            )
        ).alias("kept_lines"),
    )
    return kept.select(
        "doc_id",
        F.col("grp").alias(group_col),
        F.concat_ws("\n", F.transform("kept_lines", lambda s: s["line"])).alias("text_clean"),
        "n_lines",
        "n_lines_removed",
    )
