"""Benchmark decontamination: flag training documents that share word
n-gram shingles with an evaluation/benchmark set.

The standard LLM-corpus hygiene step (the GPT-3 appendix-C / Dolma-style
"13-gram overlap" check, here parameterized): build the shingle set of the
eval corpus, then find every training document containing any eval shingle
and report how much of it is contaminated.

Scale design (100 TB train corpus, small-by-contract eval set):
- the eval side is exploded to distinct (shingle, eval_id) rows and
  BROADCAST — eval/benchmark suites are MBs, never corpus-sized, so the
  contamination probe is a map-side hash join against the train shingle
  stream: ZERO shuffle of train data for the join itself;
- the only shuffle is the per-train-doc aggregation of matched rows,
  sized to (contaminated docs × distinct hits), not the corpus;
- shingling is the same JVM-side zip_with pass as dedup (operators/
  dedup.py word_shingles — no Python, no per-gram allocation).

No analogue in the reference (its 383-line core has no corpus ops);
this extends the LLM-data-pipeline family the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cyrela_etl_spark.operators.dedup import word_shingles


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per contaminated training doc: overlap with the eval shingle set.

    Returns (train_id, n_shingles, n_overlap_shingles, n_eval_docs,
    contamination_ratio): distinct-shingle count of the train doc, how many
    of those appear anywhere in the eval set, how many distinct eval docs
    are hit, and overlap/total as one exact-int IEEE division. Training
    docs with zero overlap are absent (inner join) — at corpus scale the
    report is sized to the contamination, not the corpus.

    ``broadcast_eval=False`` falls back to a shuffle join for the rare
    eval set too large to broadcast.
    """
    t = train.select(
        F.col(id_col).alias("train_id"),
        word_shingles(F.col(text_col), n).alias("sh"),
    ).select(
        "train_id",
        F.size("sh").cast("long").alias("n_shingles"),
        F.explode("sh").alias("shingle"),
    )
    e = (
        eval_df.select(
            F.col(id_col).alias("eval_id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )
    if broadcast_eval:
        e = F.broadcast(e)
    hits = t.join(e, "shingle")
    out = hits.groupBy("train_id", "n_shingles").agg(
        F.countDistinct("shingle").alias("n_overlap_shingles"),
        F.countDistinct("eval_id").alias("n_eval_docs"),
    )
    return out.select(
        "train_id",
        "n_shingles",
        "n_overlap_shingles",
        "n_eval_docs",
        (F.col("n_overlap_shingles") / F.col("n_shingles")).alias("contamination_ratio"),
    )
