"""Round-8 additions: corpus-statistics and pipeline-planning operators.

Text: Zipf rank-frequency fit, per-language vocabulary/hapax profile,
vocabulary-growth (Heaps) curve. Corpus: temperature-scaled multilingual
sampling weights (the mT5/XLM-R mixing rule), a token-budget epoch plan,
and a train/test shingle-leakage audit (the split-level complement of
dedup_contamination's train-vs-eval probe).

Exactness discipline (registry contract, queries/__init__.py): counts are
BIGINT, every ratio is ONE IEEE division of exact ints, each ln()/pow()
is a single transcendental rounded to 6 digits on both engines (the
text_pmi_collocations precedent) and any SUM over such values runs in
DECIMAL after the round, never a float fold.

Scale notes: every aggregate here is map-side combinable; the only
windows run over TERM or HISTOGRAM tables (vocabulary-bounded, not
corpus-bounded); the leakage join is shingle-keyed equi-join with the
distinct-shingle side reduced before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cyrela_etl_spark.operators import text as X
from cyrela_etl_spark.queries import register
from cyrela_etl_spark.queries.textq import CORPUS_SQL, corpus, sql_tokens

LN_DEC = "decimal(20,6)"   # a rounded ln()/pow() value
ACC_DEC = "decimal(38,12)"  # sums of products of two LN_DECs


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# text_zipf_fit — least-squares slope of ln(freq) vs ln(rank) over the top
# terms (Zipf's law says slope ≈ -1). The term table is vocabulary-sized,
# so the rank window runs over a bounded relation regardless of corpus
# size; the regression sums fold rounded-ln decimals (exact), and the
# slope/intercept are single double divisions at the output boundary.
# ---------------------------------------------------------------------------
_ZIPF_TOP = 30


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(F.explode(X.tokens(F.col("text"))).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    ranked = (
        counts.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("freq").desc(), F.col("term").asc())),
        )
        .filter(F.col("rank") <= _ZIPF_TOP)
    )
    xy = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 6).cast(LN_DEC).alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 6).cast(LN_DEC).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(ACC_DEC)).alias("sx"),
        F.sum(F.col("y").cast(ACC_DEC)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(ACC_DEC)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(ACC_DEC)).alias("sxx"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(
            ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))).cast("double"),
            6,
        ).alias("zipf_slope"),
    )


register(
    "text_zipf_fit",
    text_zipf_fit,
    f"""
WITH toks AS (SELECT unnest({sql_tokens('text')}) AS term FROM documents),
counts AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY term),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, term ASC) AS rank FROM counts
),
xy AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(20,6)) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(20,6)) AS y
  FROM ranked WHERE rank <= {_ZIPF_TOP}
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS DECIMAL(38,12))) AS sx, sum(CAST(y AS DECIMAL(38,12))) AS sy,
         sum(CAST(x * y AS DECIMAL(38,12))) AS sxy,
         sum(CAST(x * x AS DECIMAL(38,12))) AS sxx
  FROM xy
)
SELECT n AS n_terms,
       round(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS DOUBLE), 6) AS zipf_slope
FROM s
""",
)


# ---------------------------------------------------------------------------
# text_hapax_heaps — per-language vocabulary profile: token mass, type
# counts, hapax (terms seen once in that language), and the type/token +
# hapax/type ratios every corpus datasheet reports. Two combinable aggs
# ((lang, term) then lang); ratios are single divisions of exact ints.
# ---------------------------------------------------------------------------
def text_hapax_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    term_counts = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        term_counts.groupBy("lang")
        .agg(
            F.sum("freq").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            "n_hapax",
            (F.col("n_types") / F.col("n_tokens")).alias("type_token_ratio"),
            (F.col("n_hapax") / F.col("n_types")).alias("hapax_ratio"),
        )
    )


register(
    "text_hapax_heaps",
    text_hapax_heaps,
    f"""
WITH tc AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT lang, unnest({sql_tokens('text')}) AS term FROM documents)
  GROUP BY lang, term
)
SELECT lang,
       CAST(sum(freq) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(count(*) AS DOUBLE) / CAST(sum(freq) AS DOUBLE) AS type_token_ratio,
       CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS hapax_ratio
FROM tc GROUP BY lang
""",
)


# ---------------------------------------------------------------------------
# text_vocab_growth — the Heaps-law curve per language: cumulative
# vocabulary size as the corpus accumulates in doc_id order, sampled every
# BUCKET docs. Each term contributes at its FIRST document (min doc_id per
# (lang, term) — one combinable agg over the term table), so the
# cumulative window runs over lang-partitioned BUCKET histograms
# (corpus_size / BUCKET rows), never the corpus.
# ---------------------------------------------------------------------------
_VG_BUCKET = 5


def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_doc = (
        _docs(spark, sf_dir)
        .select("lang", "doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_bucket = first_doc.groupBy(
        "lang",
        (F.floor(F.col("first_doc") / _VG_BUCKET) * _VG_BUCKET).cast("long").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("new_types"))
    w = Window.partitionBy("lang").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_bucket.select(
        "lang",
        "bucket",
        F.col("new_types").cast("long").alias("new_types"),
        F.sum("new_types").over(w).cast("long").alias("vocab_size"),
    )


register(
    "text_vocab_growth",
    text_vocab_growth,
    f"""
WITH fd AS (
  SELECT lang, term, min(doc_id) AS first_doc
  FROM (SELECT lang, doc_id, unnest({sql_tokens('text')}) AS term FROM documents)
  GROUP BY lang, term
),
pb AS (
  SELECT lang, CAST((first_doc // {_VG_BUCKET}) * {_VG_BUCKET} AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS new_types
  FROM fd GROUP BY 1, 2
)
SELECT lang, bucket, new_types,
       CAST(sum(new_types) OVER (PARTITION BY lang ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
FROM pb
""",
)


# ---------------------------------------------------------------------------
# corpus_temperature_mix — temperature-scaled multilingual sampling weights
# (Conneau & Lample 2019 / mT5: q_l ∝ p_l^alpha), the standard fix for
# low-resource languages being drowned at alpha=1. One tiny per-language
# aggregate; each pow() is a single transcendental rounded to 6 digits and
# the normalizing sums fold decimals (exact on both engines).
# ---------------------------------------------------------------------------
_TEMP_ALPHAS = ("0.3", "0.7")


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_lang = _docs(spark, sf_dir).groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = per_lang.agg(F.sum("n_docs").alias("n_total"))
    p = per_lang.join(F.broadcast(total)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs") / F.col("n_total")).alias("p"),
    )
    for a in _TEMP_ALPHAS:
        p = p.withColumn(f"_w{a[2:]}", F.round(F.pow(F.col("p"), F.lit(float(a))), 6).cast(LN_DEC))
    sums = p.agg(
        *[F.sum(F.col(f"_w{a[2:]}").cast(ACC_DEC)).alias(f"_z{a[2:]}") for a in _TEMP_ALPHAS]
    )
    out = p.join(F.broadcast(sums))
    for a in _TEMP_ALPHAS:
        out = out.withColumn(
            f"share_a{a[2:]}",
            F.round((F.col(f"_w{a[2:]}") / F.col(f"_z{a[2:]}")).cast("double"), 6),
        )
    return out.select(
        "lang", "n_docs", "p", *[f"share_a{a[2:]}" for a in _TEMP_ALPHAS]
    )


register(
    "corpus_temperature_mix",
    corpus_temperature_mix,
    """
WITH per_lang AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM per_lang),
p AS (
  SELECT lang, n_docs, CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS p,
         CAST(round(pow(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), 0.3), 6)
              AS DECIMAL(20,6)) AS w3,
         CAST(round(pow(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), 0.7), 6)
              AS DECIMAL(20,6)) AS w7
  FROM per_lang, tot
),
z AS (SELECT sum(CAST(w3 AS DECIMAL(38,12))) AS z3, sum(CAST(w7 AS DECIMAL(38,12))) AS z7 FROM p)
SELECT lang, n_docs, p,
       round(CAST(w3 / z3 AS DOUBLE), 6) AS share_a3,
       round(CAST(w7 / z7 AS DOUBLE), 6) AS share_a7
FROM p, z
""",
)


# ---------------------------------------------------------------------------
# corpus_epoch_plan — token-budget planning: split a fixed training budget
# evenly across sources, convert each source's slice into epochs over its
# actual token mass (capped — the "don't repeat a tiny source 100×" rule,
# cf. Muennighoff et al. 2023 on repeating data), and report planned
# tokens. Integer arithmetic end-to-end; the epoch figure is the single
# division at the boundary.
# ---------------------------------------------------------------------------
_EPOCH_BUDGET = 1_000_000
_EPOCH_CAP = 4


def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_src = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(X.token_count(F.col("text")).cast("long")).cast("long").alias("n_tokens"),
        )
    )
    n_sources = per_src.agg(F.count(F.lit(1)).alias("n_src"))
    return (
        per_src.join(F.broadcast(n_sources))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.floor(F.lit(_EPOCH_BUDGET) / F.col("n_src")).cast("long").alias("budget_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "budget_tokens",
            F.least(
                F.round(F.col("budget_tokens") / F.col("n_tokens"), 6),
                F.lit(float(_EPOCH_CAP)),
            ).alias("epochs"),
            F.least(
                F.col("budget_tokens"), F.lit(_EPOCH_CAP) * F.col("n_tokens")
            ).cast("long").alias("planned_tokens"),
        )
    )


register(
    "corpus_epoch_plan",
    corpus_epoch_plan,
    f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({sql_tokens('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM per_src)
SELECT source, n_docs, n_tokens,
       CAST({_EPOCH_BUDGET} // n_src AS BIGINT) AS budget_tokens,
       least(round(CAST({_EPOCH_BUDGET} // n_src AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6),
             CAST({_EPOCH_CAP} AS DOUBLE)) AS epochs,
       CAST(least({_EPOCH_BUDGET} // n_src, {_EPOCH_CAP} * n_tokens) AS BIGINT) AS planned_tokens
FROM per_src, ns
""",
)


# ---------------------------------------------------------------------------
# ml_leakage_check — split-level contamination audit: hash-split the
# PLANTED corpus (which contains exact + near duplicates by construction)
# 80/20 by doc-id hash, then count test documents sharing any 8-token
# shingle with the train split. The shingle relation is reduced to
# DISTINCT (side, shingle) before the equi-join, so the join carries
# vocabulary-of-shingles cardinality, not corpus cardinality.
# ---------------------------------------------------------------------------
_LEAK_SHINGLE = 8
_LEAK_TRAIN_PCT = 80


def ml_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cyrela_etl_spark.functions.hashing import stable_hash64

    c = corpus(spark, sf_dir)
    split = c.withColumn(
        "is_train",
        F.pmod(stable_hash64(F.col("doc_id").cast("string")), F.lit(100)) < _LEAK_TRAIN_PCT,
    )
    toks = split.select("doc_id", "is_train", X.tokens(F.col("text")).alias("t"))
    sh = (
        toks.filter(F.size("t") >= _LEAK_SHINGLE)
        .select(
            "doc_id",
            "is_train",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - _LEAK_SHINGLE + 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, _LEAK_SHINGLE)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    train_sh = sh.filter(F.col("is_train")).select("shingle").distinct()
    test_docs = sh.filter(~F.col("is_train"))
    leaked = (
        test_docs.join(train_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    totals = split.filter(~F.col("is_train")).agg(
        F.count(F.lit(1)).cast("long").alias("n_test_docs")
    )
    n_leaked = leaked.agg(F.count(F.lit(1)).cast("long").alias("n_leaked"))
    return (
        totals.join(F.broadcast(n_leaked))
        .select(
            "n_test_docs",
            "n_leaked",
            (F.col("n_leaked") / F.col("n_test_docs")).alias("leak_ratio"),
        )
    )


def _leakage_oracle() -> str:
    from cyrela_etl_spark.queries.textq import sql_hex64

    h = sql_hex64("CAST(doc_id AS VARCHAR)")
    return f"""
WITH corpus AS ({CORPUS_SQL}),
split AS (
  SELECT doc_id, text, ({h} % 100) < {_LEAK_TRAIN_PCT} AS is_train FROM corpus
),
toks AS (SELECT doc_id, is_train, {sql_tokens('text')} AS t FROM split),
sh AS (
  SELECT DISTINCT doc_id, is_train,
         unnest(list_transform(
           generate_series(1, len(t) - {_LEAK_SHINGLE} + 1),
           i -> array_to_string(t[i:i+{_LEAK_SHINGLE}-1], ' '))) AS shingle
  FROM toks WHERE len(t) >= {_LEAK_SHINGLE}
),
train_sh AS (SELECT DISTINCT shingle FROM sh WHERE is_train),
leaked AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN train_sh t USING (shingle) WHERE NOT s.is_train
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_test_docs FROM split WHERE NOT is_train),
nl AS (SELECT CAST(count(*) AS BIGINT) AS n_leaked FROM leaked)
SELECT n_test_docs, n_leaked,
       CAST(n_leaked AS DOUBLE) / CAST(n_test_docs AS DOUBLE) AS leak_ratio
FROM tot, nl
"""


register("ml_leakage_check", ml_leakage_check, _leakage_oracle())
