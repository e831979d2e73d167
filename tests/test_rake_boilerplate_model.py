"""Model checks for text_rake_keywords and corpus_boilerplate_removal
(queries/textq.py) — model-check wave 3.

- RAKE: the full candidate-phrase pipeline in plain Python — running-
  stopword-count phrase segmentation, the <=4-token phrase cap (whose
  dropped phrases must also drop their tokens from the word-score
  denominator), exact-ppm deg/freq word scores, per-occurrence word sums
  over the SPLIT phrase string, and the (score, n_occ, phrase) top-20
  total order.
- boilerplate removal: per-source line document-frequency with the
  min-docs floor and the >30% ratio, occurrence counting vs distinct-doc
  counting (a doc repeating a boilerplate line loses every copy but the
  line counts once toward DF), and order-preserving reassembly.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd

_STOP = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
         "that", "for", "on", "as", "with", "was", "at", "by"]
_MAX_PHRASE, _TOP, _SCALE = 4, 20, 1_000_000
_BOILER_LINE = "cookie notice accept terms"


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def test_rake_keywords_match_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import text_rake_keywords

    got = [
        (r["phrase"], r["n_occurrences"], r["score_ppm"])
        for r in text_rake_keywords(spark, sf_dir).collect()
    ]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
    kept_phrases: list[str] = []
    deg: Counter = Counter()
    freq: Counter = Counter()
    stop = set(_STOP)
    for text in docs:
        runs: list[list[str]] = [[]]
        for w in _toks(text):
            if w in stop:
                runs.append([])
            else:
                runs[-1].append(w)
        for run in runs:
            if 0 < len(run) <= _MAX_PHRASE:
                kept_phrases.append(" ".join(run))
                for w in run:
                    deg[w] += len(run)
                    freq[w] += 1
    wscore = {w: (_SCALE * deg[w]) // freq[w] for w in deg}
    pagg = Counter(kept_phrases)
    scored = [
        (sum(wscore[w] for w in phrase.split(" ")), n, phrase)
        for phrase, n in pagg.items()
    ]
    scored.sort(key=lambda t: (-t[0], -t[1], t[2]))
    want = [(phrase, n, s) for s, n, phrase in scored[:_TOP]]
    assert got == want


def test_boilerplate_removal_matches_python_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import corpus_boilerplate_removal

    got = {
        r["doc_id"]: (r["source"], r["text_clean"], r["n_lines"], r["n_lines_removed"])
        for r in corpus_boilerplate_removal(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "source", "text"]]
    planted = [
        (int(r.doc_id), r.source,
         (_BOILER_LINE + "\n" + r.text) if r.doc_id % 2 == 0 else r.text)
        for r in docs.itertuples(index=False)
    ]
    group_docs: Counter = Counter(src for _, src, _ in planted)
    line_df: dict[tuple[str, str], set[int]] = defaultdict(set)
    for doc_id, src, text in planted:
        for line in text.split("\n"):
            line_df[(src, line)].add(doc_id)
    boiler = {
        key
        for key, ds in line_df.items()
        if len(ds) >= 2 and len(ds) / group_docs[key[0]] > 0.3
    }
    want = {}
    for doc_id, src, text in planted:
        lines = text.split("\n")
        kept = [ln for ln in lines if (src, ln) not in boiler]
        want[doc_id] = (src, "\n".join(kept), len(lines), len(lines) - len(kept))
    assert got == want
