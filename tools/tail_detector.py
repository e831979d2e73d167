"""Multi-consumer-tail detector (VERDICT r13 item 3): the structural
check behind the r12/r13 persist-diet sweeps, automated.

The class of defect: a DataFrame variable with >= 2 consumers whose
chain contains expensive work (a shuffle-inducing operator over scanned
or cached data) and no ``persist()`` — each consumer re-plans the whole
subtree, so the corpus-scale aggregate / unrolled iteration runs once
PER CONSUMER. Found five instances in round 13 (kcore, LPA,
cluster-quality, degree-distribution, label-margin: 64 -> 28 shuffle
sites) and one in round 12 (PCA) — every one by a manual read of the
>= 7-shuffle plans in PLAN_REPORT.md. This module is that read, as code.

Two detectors, two questions:

``detect_consumers`` (analyzed plan with caches substituted,
``queryExecution.withCachedData``) answers "is some variable with heavy
work consumed >= 2 times un-persisted?" — before Catalyst runs, the
consumers' copies are still canonically IDENTICAL, so duplicates group
exactly by semanticHash/sameResult, and a persist shows up as an
InMemoryRelation leaf. But a hit here is NOT always a real recompute:
copies that stay canonically identical through optimization are merged
by runtime exchange reuse (AQE stage cache) — e.g. TPC-H Q15's revenue
view used by both the max() and the join survives optimization
unchanged, so its one shuffle runs once. A sweep of the full registry
with this detector alone flags 46 such reuse-saved or k-row-bounded
duplicates.

``detect`` (optimized plan — THE GATE) answers "did Catalyst specialize
the copies so runtime reuse can no longer merge them?" — the exact
mechanism behind every r12/r13 finding: column pruning / filter
pushdown rewrites each consumer's copy (narrower aggregate output list,
extra Project inside one copy), the canonical forms diverge, and the
AQE stage cache — keyed on canonical equality — misses. Flags require:

- SKELETON-IDENTICAL copies: same preorder sequence of heavy operators
  (keyed aggregate / join / window / dedup / global sort /
  grouped-pandas; grouping, join and partition expressions id-stripped)
  over the same leaves (scan paths / cache instances). Global
  (grouping-less) aggregates are transparent: they are 1-row reducers
  whose cost is their INPUT subtree, and keying on their expression
  lists would either collide different reductions or miss pruned copies
  of the same one.
- UNREUSABLE: the copies' heavy cores (first heavy node in preorder)
  are NOT all canonically identical — at least one pair differs, so
  the expensive stage genuinely runs more than once. All-identical
  groups are suppressed (runtime exchange reuse merges them).
- EXPENSIVE: >= 1 heavy operator and >= 1 non-local leaf (file scan or
  cached relation — re-joining a cached corpus-scale relation per
  consumer is exactly the r13 k-core finding).
- MAXIMAL and NON-NESTED: nested duplicates inside a flagged subtree
  are not re-reported, and a node paired with its own no-op wrapper
  counts once (antichain per group).

The cure the flag asks for is the r13 one: persist the shared relation
(the copies then collapse to one InMemoryRelation leaf, computed once)
or restructure so the variable has one consumer (e.g. degrees via
explode(array(src, dst)) instead of a union of two selects).

Coverage: the walk descends the main plan tree AND every subquery
expression plan (node.subqueries(), recursively — VERDICT r14 item 3;
rounds 12-14 covered the main tree only, with ReuseSubquery pinned as
the boundary). Subquery copies participate in grouping exactly like
main-tree copies: canonically IDENTICAL duplicates are suppressed
(Spark's ReuseSubquery rule merges those at runtime, the subquery
analogue of exchange reuse — premise pinned by
test_runtime_subquery_reuse_saves_identical_copies), while
skeleton-identical copies whose heavy cores DIVERGED (e.g. two scalar
subqueries over the same aggregate, each pruned to a different column)
are real per-copy recomputes and flag. Seeded regression:
test_tail_detector_flags_diverged_subquery_duplicates.

Used by tests/test_plan_quality.py (seeded-regression unit) and
tests/test_plan_sweep.py (registry-wide gate at sf0.001).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_ID_RE = re.compile(r"#\d+L?")

# logical operators that induce a shuffle (or an Arrow python stage) —
# the work worth never planning twice
_HEAVY = {
    "Aggregate",
    "Join",
    "Window",
    "Deduplicate",
    "Intersect",
    "Except",
    "RepartitionByExpression",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "ApplyInPandasWithState",
}
# leaves whose recompute is free-ish (driver-local literals / ranges)
_LOCAL_LEAVES = {"LocalRelation", "OneRowRelation", "Range", "LocalTableScan"}


def _strip(s: str) -> str:
    return _ID_RE.sub("", s)


def _seq_str(jseq) -> str:
    return _strip(jseq.mkString(","))


def _node_sig(node) -> tuple[str, ...] | None:
    """Skeleton contribution of one logical node: a tuple for heavy
    operators (keyed by their shuffle-defining expressions) and leaves
    (keyed by identity), None for transparent operators (Project /
    Filter / Union / global aggregates / ... — the nodes Catalyst
    specializes per consumer, plus reducers whose cost is their input)."""
    name = node.nodeName()
    try:
        if name == "Aggregate":
            keys = _seq_str(node.groupingExpressions())
            if not keys:
                return None  # global aggregate: transparent (see module doc)
            return ("Aggregate", keys)
        if name == "Join":
            return ("Join", node.joinType().toString(), _strip(node.condition().toString()))
        if name == "Window":
            return (
                "Window",
                _seq_str(node.partitionSpec()),
                _seq_str(node.orderSpec()),
                _seq_str(node.windowExpressions()),
            )
        if name == "Deduplicate":
            return ("Deduplicate", _seq_str(node.keys()))
        if name == "Sort":
            if getattr(node, "global")():  # only global sorts shuffle
                return ("Sort", _seq_str(node.order()))
            return None
        if name in ("Intersect", "Except"):
            return (name, str(node.isAll()))
        if name == "RepartitionByExpression":
            return (name, _seq_str(node.partitionExpressions()))
        if name in ("FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas"):
            return (name, _strip(node.argString(16)))
        if name == "InMemoryRelation":
            # identity of the CACHE INSTANCE (semanticHash covers the
            # cached plan), not just the schema — two different cached
            # relations sharing a schema must not match
            return ("CACHED", _strip(node.argString(16)), str(node.semanticHash()))
        if node.children().size() == 0:
            if name in _LOCAL_LEAVES:
                return ("LOCAL",)
            # file-source leaf: identify by the pruning-stable argString
            # MINUS the output column list (column pruning rewrites a V1
            # LogicalRelation's output in place)
            arg = _strip(node.argString(16))
            arg = re.sub(r"\[[^]]*\]", "", arg)
            return ("SCAN", name, arg)
    except Exception:
        # a node whose extractor shape drifted: fall back to its
        # id-stripped one-liner so the walk never dies mid-gate
        return (name, _strip(node.argString(16)))
    return None


@dataclass
class _Occurrence:
    node_id: int
    ancestors: set[int]
    node: object = field(repr=False)


@dataclass
class Finding:
    """One flagged duplicate-subtree group in one query's plan."""

    skeleton: tuple
    count: int
    distinct_forms: int
    heavy_ops: int
    example: str

    def __str__(self) -> str:
        return (
            f"{self.count}x planned ({self.distinct_forms} distinct canonical "
            f"forms, {self.heavy_ops} heavy ops): {self.example}"
        )


def _walk(node, node_id=0, ancestors=frozenset()):
    """Preorder (node, id, ancestor-ids); InMemoryRelation is a leaf (its
    cached plan builds once — the cure, not the disease). Descends into
    subquery expression plans (ScalarSubquery/Exists/ListQuery) as extra
    children of their host node: a subquery executes under its host, so
    its heavy nodes belong to every host ancestor's subtree cost, and
    duplicate subquery plans group with (or against) main-tree copies."""
    yield node, node_id, ancestors
    if node.nodeName() == "InMemoryRelation":
        return
    nxt = node_id + 1
    ch = node.children()
    child_anc = ancestors | {node_id}
    for i in range(ch.size()):
        sub = list(_walk(ch.apply(i), nxt, child_anc))
        yield from sub
        nxt = sub[-1][1] + 1
    try:
        sq = node.subqueries()
        n_sq = sq.size()
    except Exception:
        return
    for i in range(n_sq):
        sub = list(_walk(sq.apply(i), nxt, child_anc))
        yield from sub
        nxt = sub[-1][1] + 1


def _antichain(occs: list[_Occurrence]) -> list[_Occurrence]:
    """Drop occurrences nested inside another occurrence of the same
    group (a node and its own wrapper are ONE computation). Input must
    be in preorder (ancestors first)."""
    kept: list[_Occurrence] = []
    for o in occs:
        if not any(k.node_id in o.ancestors for k in kept):
            kept.append(o)
    return kept


def _classify(skel: list[tuple[str, ...]]) -> tuple[int, bool]:
    heavy = sum(1 for sig in skel if sig[0] in _HEAVY)
    nonlocal_leaf = any(sig[0] in ("SCAN", "CACHED") for sig in skel)
    return heavy, nonlocal_leaf


def _example(skel) -> str:
    return " <- ".join(
        "/".join(p for p in sig[:2])
        for sig in skel[:8]
        if sig[0] in _HEAVY or sig[0] in ("SCAN", "CACHED")
    )[:200]


def _maximal(cands: list[tuple[list, list[_Occurrence], int]]) -> list[Finding]:
    cands.sort(key=lambda g: -len(g[0]))
    accepted: list[Finding] = []
    accepted_ids: set[int] = set()
    for skel, occs, forms in cands:
        if any(o.node_id in accepted_ids or (o.ancestors & accepted_ids) for o in occs):
            continue
        accepted_ids.update(o.node_id for o in occs)
        heavy, _ = _classify(skel)
        accepted.append(
            Finding(
                skeleton=tuple(skel),
                count=len(occs),
                distinct_forms=forms,
                heavy_ops=heavy,
                example=_example(skel),
            )
        )
    return accepted


def detect(df) -> list[Finding]:
    """THE GATE: skeleton-identical, canonically-diverged (unreusable)
    duplicate heavy subtrees in the OPTIMIZED plan. Empty on every
    registered query; a flag means a persist (or a single-consumer
    restructure) is owed before the query lands."""
    root = df._jdf.queryExecution().optimizedPlan()
    nodes = list(_walk(root))
    node_by_id = {nid: node for node, nid, _anc in nodes}

    sigs: dict[int, tuple[str, ...] | None] = {}
    skel: dict[int, list] = {}
    first_heavy: dict[int, int | None] = {}
    for node, nid, _anc in nodes:
        sigs[nid] = _node_sig(node)
        skel[nid] = []
        first_heavy[nid] = None
    for node, nid, anc in nodes:  # preorder, so appends are preorder too
        s = sigs[nid]
        if s is None:
            continue
        for a in (*anc, nid):
            skel[a].append(s)
            if s[0] in _HEAVY and first_heavy[a] is None:
                first_heavy[a] = nid

    groups: dict[tuple, list[_Occurrence]] = {}
    for node, nid, anc in nodes:
        key = tuple(skel[nid])
        heavy, nonlocal_leaf = _classify(skel[nid])
        if heavy >= 1 and nonlocal_leaf:
            groups.setdefault(key, []).append(
                _Occurrence(node_id=nid, ancestors=set(anc), node=node)
            )

    cands = []
    for key, occs in groups.items():
        occs = _antichain(occs)
        if len(occs) < 2:
            continue
        # reuse check on the heavy CORES: if every copy's first heavy
        # node is canonically identical, the expensive stage is one
        # runtime stage (AQE exchange reuse) — suppressed
        hashes = set()
        for o in occs:
            hn = first_heavy[o.node_id]
            try:
                hashes.add(node_by_id[hn].semanticHash())
            except Exception:
                hashes.add(o.node_id)
        if len(hashes) < 2:
            continue
        cands.append((list(key), occs, len(hashes)))
    return _maximal(cands)


def detect_consumers(df) -> list[Finding]:
    """Diagnostic: multi-consumer un-persisted variables in the analyzed
    plan (withCachedData) — includes reuse-saved duplicates, so NOT a
    gate; use to enumerate candidates when hand-auditing a heavy plan."""
    root = df._jdf.queryExecution().withCachedData()
    nodes = list(_walk(root))

    by_hash: dict[int, list[_Occurrence]] = {}
    for node, nid, anc in nodes:
        try:
            h = node.semanticHash()
        except Exception:
            continue
        by_hash.setdefault(h, []).append(
            _Occurrence(node_id=nid, ancestors=set(anc), node=node)
        )

    cands = []
    for _h, occs in by_hash.items():
        if len(occs) < 2:
            continue
        rep = occs[0]
        confirmed = [o for o in occs if o is rep or rep.node.sameResult(o.node)]
        confirmed = _antichain(confirmed)
        if len(confirmed) < 2:
            continue
        skel = _subtree_sigs(rep.node)
        heavy, nonlocal_leaf = _classify(skel)
        if heavy >= 1 and nonlocal_leaf:
            cands.append((skel, confirmed, 1))
    return _maximal(cands)


def _subtree_sigs(node) -> list[tuple[str, ...]]:
    """Preorder heavy/leaf sig lines of one subtree (classification only)."""
    out: list[tuple[str, ...]] = []
    for n, _i, _a in _walk(node):
        sig = _node_sig(n)
        if sig is not None:
            out.append(sig)
    return out
