"""Model checks for curation_pipeline, corpus_dataset_card,
events_rolling_active_users, and events_alert_debounce — model-check
wave 3. The curation model composes the already-verified Python quality/
langid/fingerprint models through the keep-filter, exact-dedup canonical
pick, and per-language rollup — pinning the single-scan COMPOSITION, not
just the parts. The card, rolling-DAU (range-frame distinct union), and
debounce (cooldown gaps-and-islands) are Counter/set walks.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pandas as pd

_MIN_QUALITY = 0.5
_KEEP = {"en", "de", "es", "fr"}
_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}
_ORDER = ["en", "de", "es", "fr", "zh"]
_STOP = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
         "that", "for", "on", "as", "with", "was", "at", "by"}


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _quality(text: str) -> float:
    toks = _toks(text)
    n_tok, n_chr = len(toks), len(text)
    n_punct = sum(1 for ch in text if ch in ".,!?;:")
    n_stop = sum(1 for t in toks if t in _STOP)
    length_sig = min(n_tok, 100) / 100
    stop_sig = 1.0 if n_tok == 0 else min((n_stop / n_tok) * 4, 1.0)
    punct_sig = 1.0 - (1.0 if n_chr == 0 else min((n_punct / n_chr) * 10, 1.0))
    return (length_sig + stop_sig + punct_sig) / 3.0


def _lang(text: str) -> str:
    toks = _toks(text)
    scores = {lang: sum(1 for t in toks if t in _MARKERS[lang]) for lang in _ORDER}
    best = max(scores.values())
    return "und" if best == 0 else next(l for l in _ORDER if scores[l] == best)


def test_curation_pipeline_matches_composed_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import curation_pipeline

    got = {
        r["lang_pred"]: (r["n_docs"], r["total_tokens"], r["min_doc_id"])
        for r in curation_pipeline(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    base = [(int(d), t) for d, t in docs.itertuples(index=False)]
    rows = (
        base
        + [(d + 100000, t) for d, t in base if d % 10 == 0]
        + [(d + 200000, t + " zyx extra") for d, t in base if d % 7 == 0]
    )
    groups: dict[str, list[tuple[int, str, int]]] = defaultdict(list)
    for doc_id, text in rows:
        q = _quality(text)
        lang = _lang(text)
        if q >= _MIN_QUALITY and lang in _KEEP:
            k = hashlib.md5(
                re.sub(r"\s+", " ", text.lower()).strip().encode()
            ).hexdigest()
            groups[k].append((doc_id, lang, len(_toks(text))))
    per_lang: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for members in groups.values():
        doc_id = min(m[0] for m in members)
        _, lang, n_tok = members[0]  # same content -> same lang/tokens
        per_lang[lang].append((doc_id, n_tok))
    want = {
        lang: (len(ms), sum(n for _, n in ms), min(d for d, _ in ms))
        for lang, ms in per_lang.items()
    }
    assert got == want


def test_dataset_card_matches_counter_model(spark, sf_dir):
    from cyrela_etl_spark.queries.textq import corpus_dataset_card

    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["mean_tokens_milli"], r["dup_ppm"],
                      r["n_langs"], r["top_lang"], r["top_lang_ppm"])
        for r in corpus_dataset_card(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["source", "lang", "text"]]
    agg: dict = defaultdict(lambda: {"n": 0, "tok": 0, "keys": set(), "langs": Counter()})
    for r in docs.itertuples(index=False):
        a = agg[r.source]
        a["n"] += 1
        a["tok"] += len(_toks(r.text))
        a["keys"].add(
            hashlib.md5(re.sub(r"\s+", " ", r.text.lower()).strip().encode()).hexdigest()
        )
        a["langs"][r.lang] += 1
    want = {}
    for src, a in agg.items():
        top_n, top_lang = max((n, lang) for lang, n in a["langs"].items())
        want[src] = (
            a["n"], a["tok"], (1000 * a["tok"]) // a["n"],
            (1_000_000 * (a["n"] - len(a["keys"]))) // a["n"],
            len(a["langs"]), top_lang, (1_000_000 * top_n) // a["n"],
        )
    assert got == want


def test_rolling_active_users_matches_set_union_model(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_rolling_active_users

    got = {
        (r["event_type"], r["bucket"].isoformat()): r["n_users_24h"]
        for r in events_rolling_active_users(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "ts", "user_id"]]
    buckets: dict = defaultdict(set)
    for r in ev.itertuples(index=False):
        buckets[(r.event_type, r.ts.floor("h"))].add(int(r.user_id))
    want = {}
    for (et, b), _ in buckets.items():
        users: set = set()
        for (et2, b2), us in buckets.items():
            if et2 == et and b - pd.Timedelta(hours=23) <= b2 <= b:
                users |= us
        want[(et, b.isoformat())] = len(users)
    assert got == want


def test_alert_debounce_matches_python_walk(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import events_alert_debounce

    got = {
        (r["user_id"], r["burst_id"]): (
            r["alert_ts"].isoformat(), r["leader_event_id"], r["n_suppressed"]
        )
        for r in events_alert_debounce(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = {}
    for uid, g in ev[ev.value > 100.0].groupby("user_id"):
        rows = sorted(g.itertuples(index=False), key=lambda r: (r.ts, r.event_id))
        prev_ms, burst = None, 0
        bursts: dict = defaultdict(list)
        for r in rows:
            ms = r.ts.value // 10**6
            if prev_ms is None or ms - prev_ms > 600_000:
                burst += 1
            prev_ms = ms
            bursts[burst].append(r)
        for b, members in bursts.items():
            want[(int(uid), b)] = (
                min(m.ts for m in members).isoformat(),
                min(int(m.event_id) for m in members),
                len(members) - 1,
            )
    assert got == want
