"""Cache-contract scope (cyrela_etl_spark/cache.py): operators' plan-
backing persists are released at the scope boundary — the embedder-side
half of the persist discipline documented in queries/__init__."""

from __future__ import annotations

from cyrela_etl_spark.cache import released_cache


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_released_cache_drops_operator_persists(spark, sf_dir):
    from cyrela_etl_spark.operators.graph import integer_pagerank

    spark.catalog.clearCache()
    assert _n_cached_rdds(spark) == 0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "id_a LONG, id_b LONG"
    )
    with released_cache(spark):
        out = integer_pagerank(edges, iterations=2).collect()
        assert len(out) == 4
        # the operator's plan-backing persists are live inside the scope
        assert _n_cached_rdds(spark) > 0
    assert _n_cached_rdds(spark) == 0


def test_released_cache_releases_on_error_too(spark):
    spark.catalog.clearCache()
    try:
        with released_cache(spark):
            df = spark.range(100).persist()
            df.count()
            assert _n_cached_rdds(spark) > 0
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert _n_cached_rdds(spark) == 0
