"""Plan-shape regression tests for round-3 operators: the physical plan IS
the scale contract (pushed filters, broadcast dims, bounded exchanges) —
a silently regressed plan would still pass value checks at test SF while
being catastrophic at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q14_broadcasts_part_and_pushes_date_filter(spark, sf_dir):
    from cyrela_etl_spark.queries.relational import q14_promo_revenue

    plan = _plan(q14_promo_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: lineitem scan must not read returnflag/linestatus
    scan = next(l for l in plan.splitlines() if "lineitem.parquet" in l)
    assert "l_returnflag" not in scan and "ReadSchema" in scan


def test_token_pack_single_shard_exchange(spark, sf_dir):
    from cyrela_etl_spark.operators.corpus import pack_token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(pack_token_budget(docs))
    assert plan.count("Exchange hashpartitioning") == 1  # shard only


def test_chunking_has_no_exchange(spark, sf_dir):
    from cyrela_etl_spark.operators.corpus import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(chunk_documents(docs))
    assert "Exchange" not in plan
    assert "Generate" in plan  # posexplode generator, not a join


def test_dataset_split_and_redact_are_pure_projections(spark, sf_dir):
    from cyrela_etl_spark.operators.corpus import dataset_split, redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (dataset_split(docs), redact_pii(docs)):
        plan = _plan(df)
        assert "Exchange" not in plan and "Join" not in plan


def test_exists_rewrites_to_semi_join(spark, sf_dir):
    from cyrela_etl_spark.queries.relational import sql_q04_exists

    plan = _optimized(sql_q04_exists(spark, sf_dir))
    assert "LeftSemi" in plan  # no per-row correlated subquery survives


def test_ivf_assignment_stays_python_arrow_not_literal(spark, sf_dir):
    from cyrela_etl_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4).select(F.col("vec_id").alias("query_id"), "embedding")
    plan = _plan(ivf_topk(emb, q, k=3, n_centroids=8))
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
