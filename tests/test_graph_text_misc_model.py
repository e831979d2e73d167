"""Model checks for graph_degree_distribution, graph_component_sizes,
text_bpe_pair_stats, and text_language_confusion — model-check wave 3.
Python rebuilds of the duplicate-pair graph (degree histogram with the
descending cumulative share; union-find component-size histogram), the
adjacent character-pair BPE statistics with the >=2-char word guard, and
the langid confusion matrix crossing the labeled lang column with the
marker-vote prediction model.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pandas as pd

_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}
_ORDER = ["en", "de", "es", "fr", "zh"]


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _corpus_rows(sf_dir: str) -> list[tuple[int, str]]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    base = [(int(d), t) for d, t in docs.itertuples(index=False)]
    return (
        base
        + [(d + 100000, t) for d, t in base if d % 10 == 0]
        + [(d + 200000, t + " zyx extra") for d, t in base if d % 7 == 0]
    )


def _dup_edges(sf_dir: str) -> set[tuple[int, int]]:
    by_exact: dict[str, list[int]] = defaultdict(list)
    by_prefix: dict[str, list[int]] = defaultdict(list)
    for doc_id, text in _corpus_rows(sf_dir):
        by_exact[_md5(re.sub(r"\s+", " ", text.lower()).strip())].append(doc_id)
        by_prefix[_md5(" ".join(_toks(text)[:6]))].append(doc_id)
    edges: set[tuple[int, int]] = set()
    for groups in (by_exact, by_prefix):
        for ids in groups.values():
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    edges.add((a, b))
    return edges


def test_degree_distribution_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import graph_degree_distribution

    got = {
        r["degree"]: (r["n_nodes"], r["cum_nodes"], r["node_share"])
        for r in graph_degree_distribution(spark, sf_dir).collect()
    }
    deg: Counter = Counter()
    for a, b in _dup_edges(sf_dir):
        deg[a] += 1
        deg[b] += 1
    hist = Counter(deg.values())
    tn = sum(hist.values())
    want, cum = {}, 0
    for d in sorted(hist, reverse=True):
        cum += hist[d]
        want[d] = (hist[d], cum, cum / tn)
    assert got == want


def test_component_sizes_match_union_find(spark, sf_dir):
    from cyrela_etl_spark.queries.round8q import graph_component_sizes

    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in graph_component_sizes(spark, sf_dir).collect()
    }
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = _dup_edges(sf_dir)
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = Counter(find(v) for v in {x for ab in edges for x in ab})
    hist = Counter(sizes.values())
    want = {sz: (n, sz * n) for sz, n in hist.items()}
    assert got == want


def test_bpe_pair_stats_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_bpe_pair_stats

    got = [
        (r["pair"], r["n_occurrences"])
        for r in text_bpe_pair_stats(spark, sf_dir).collect()
    ]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
    pairs: Counter = Counter()
    for text in docs:
        for w in _toks(text):
            if len(w) >= 2:
                pairs.update(w[i : i + 2] for i in range(len(w) - 1))
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_language_confusion_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_language_confusion

    got = {
        (r["lang_label"], r["lang_pred"]): (r["n_docs"], r["row_share_ppm"], r["is_correct"])
        for r in text_language_confusion(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "lang", "text"]]
    cells: Counter = Counter()
    totals: Counter = Counter()
    for r in docs.itertuples(index=False):
        toks = _toks(r.text)
        scores = {lang: sum(1 for t in toks if t in _MARKERS[lang]) for lang in _ORDER}
        best = max(scores.values())
        pred = "und" if best == 0 else next(l for l in _ORDER if scores[l] == best)
        cells[(r.lang, pred)] += 1
        totals[r.lang] += 1
    want = {
        (lab, pred): (n, (1_000_000 * n) // totals[lab], lab == pred)
        for (lab, pred), n in cells.items()
    }
    assert got == want
