"""The registry cache contract, made actionable for embedders.

Library operators persist plan-backing intermediates that only the CALLER
can release (see the contract note in queries/__init__ and the
``# release:`` markers at each persist site). Two release tools:

- ``released_cache`` — session-GLOBAL scope: every DataFrame cache
  created by the work inside the scope is dropped on exit, the same
  ``spark.catalog.clearCache()`` bench.py and both correctness harnesses
  issue between queries. Don't wrap a scope around work whose caches a
  CONCURRENT consumer still needs.
- ``release_plan_caches(df)`` — the narrow alternative (VERDICT r9 item
  5) for exactly that concurrent-consumer session: walks the DataFrame's
  cache-substituted logical plan, finds the ``InMemoryRelation`` frames
  that back IT, and uncaches only those — other queries' persists stay
  live. Call it after fully consuming one query's result.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def released_cache(spark: SparkSession) -> Iterator[SparkSession]:
    """Run registry queries / library operators inside the scope; all
    DataFrame caches (the operators' plan-backing persists included) are
    released when it exits — success or failure."""
    try:
        yield spark
    finally:
        spark.catalog.clearCache()


def _walk(node, out: list) -> list:
    out.append(node)
    for i in range(node.children().length()):
        _walk(node.children().apply(i), out)
    return out


def _pwalk(node, out: list) -> list:
    """Physical-plan walk that descends through the AQE wrapper (whose
    real tree hangs off inputPlan(), not children())."""
    out.append(node)
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        _pwalk(node.inputPlan(), out)
    for i in range(node.children().length()):
        _pwalk(node.children().apply(i), out)
    return out


def _closure_builders(outer_imrs) -> list:
    """Every CachedRDDBuilder the plan depends on, TRANSITIVELY: an
    iterative operator's round-N cache scans round N-1's cache inside its
    own cached physical plan (InMemoryTableScanExec), so releasing only
    the outermost frames would leak every earlier round."""
    builders: list = []
    frontier = list(outer_imrs)
    while frontier:
        imr = frontier.pop()
        b = imr.cacheBuilder()
        if any(b.equals(x) for x in builders):
            continue
        builders.append(b)
        for n in _pwalk(b.cachedPlan(), []):
            if n.getClass().getSimpleName() == "InMemoryTableScanExec":
                frontier.append(n.relation())
    return builders


def release_plan_caches(df: DataFrame, blocking: bool = True) -> int:
    """Uncache exactly the persisted frames backing ``df``'s plan; leave
    every other cached query intact. Returns how many cache entries were
    released.

    How: the analyzer's cache substitution (``withCachedData``) replaces
    plan fragments that hit the cache with ``InMemoryRelation`` nodes, so
    walking that plan yields precisely the caches this DataFrame depends
    on. Each is matched back to the cache manager's registry by its
    ``CachedRDDBuilder`` (shared between the registry entry and the
    substituted copy) and dropped through ``uncacheQuery`` — the same
    removal path ``DataFrame.unpersist`` takes, so storage blocks and
    registry entry go together. Uses two internal JVM handles
    (``sharedState().cacheManager()`` and its ``cachedData`` field, read
    reflectively) — pinned by tests/test_cache_contract.py so a Spark
    upgrade that moves them fails loudly, not silently.

    Driver-side metadata only: no job runs; with ``blocking=True`` the
    executors' block removal is awaited."""
    spark = df.sparkSession
    jspark = spark._jsparkSession
    nodes = _walk(df._jdf.queryExecution().withCachedData(), [])
    builders = _closure_builders(
        n for n in nodes if n.getClass().getSimpleName() == "InMemoryRelation"
    )
    if not builders:
        return 0
    cm = jspark.sharedState().cacheManager()
    fld = next(
        f for f in cm.getClass().getDeclaredFields() if f.getName() == "cachedData"
    )
    fld.setAccessible(True)
    seq = fld.get(cm)
    to_drop = []
    for i in range(seq.size()):
        cd = seq.apply(i)
        if any(cd.cachedRepresentation().cacheBuilder().equals(b) for b in builders):
            to_drop.append(cd)
    for cd in to_drop:
        # cascade=False: dependent caches of OTHER queries stay valid
        cm.uncacheQuery(jspark, cd.plan(), False, blocking)
    return len(to_drop)
