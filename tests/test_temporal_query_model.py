"""Model checks for four inline temporal queries (queries/temporalq.py:
temporal_sessionize, temporal_cusum_drift, temporal_ewma,
temporal_scd2_intervals) — model-check wave 3.

Each DuckDB oracle replays the same window/fold construction in SQL, so
these plain-Python re-derivations (sort + loop over pandas-read parquet)
are the genuinely independent second implementation: sessionize as an
explicit gap-walk, CUSUM as the textbook reset-at-zero recurrence
(S_i = max(0, S_{i-1} + d_i) — provably equal to the prefix-sum-minus-
running-min form the engine uses, so the test also pins that identity),
EWMA as a left fold in the engine's exact IEEE operation order, SCD2 as
a run-length walk.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_ALPHA = 0.2


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _iso(ts) -> str | None:
    return None if ts is None else ts.isoformat()


def test_sessionize_matches_python_gap_walk(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import temporal_sessionize

    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], _iso(r["session_start"]), _iso(r["session_end"])
        )
        for r in temporal_sessionize(spark, sf_dir).collect()
    }
    ev = _events(sf_dir)
    want = {}
    for uid, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(index=False), key=lambda r: (r.ts, r.event_id))
        idx, prev_s = 0, None
        sessions: dict[int, list] = defaultdict(list)
        for r in rows:
            epoch_s = r.ts.value // 10**9  # engine compares SECOND-truncated ts
            if prev_s is None or epoch_s - prev_s > 1800:
                idx += 1
            prev_s = epoch_s
            sessions[idx].append(r.ts)
        for i, tss in sessions.items():
            want[(uid, i)] = (len(tss), min(tss).isoformat(), max(tss).isoformat())
    assert got == want


def test_cusum_drift_matches_reset_at_zero_recurrence(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import temporal_cusum_drift

    got = {
        r["event_type"]: (
            r["n_days"], r["target_per_day"], r["slack_k"],
            r["peak_high"], r["peak_low"], r["drift_alarm"],
        )
        for r in temporal_cusum_drift(spark, sf_dir).collect()
    }
    ev = _events(sf_dir)
    daily: dict[str, dict] = defaultdict(lambda: defaultdict(int))
    for r in ev.itertuples(index=False):
        daily[r.event_type][r.ts.date()] += 1
    want = {}
    for et, days in daily.items():
        xs = [days[d] for d in sorted(days)]
        target = sum(xs) // len(xs)
        k = max(target // 20, 1)
        sh = sl = peak_h = peak_l = 0
        for x in xs:
            sh = max(0, sh + (x - target - k))
            sl = max(0, sl + (target - x - k))
            peak_h, peak_l = max(peak_h, sh), max(peak_l, sl)
        want[et] = (
            len(xs), target, k, peak_h, peak_l, peak_h > 5 * k or peak_l > 5 * k
        )
    assert got == want


def test_ewma_matches_python_left_fold(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import temporal_ewma

    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in temporal_ewma(spark, sf_dir).collect()
    }
    ev = _events(sf_dir)
    want = {}
    for uid, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(index=False), key=lambda r: (r.ts, r.event_id))
        acc = rows[0].value
        for r in rows[1:]:
            acc = _ALPHA * r.value + (1.0 - _ALPHA) * acc
        rounded = float(
            Decimal(repr(acc)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )
        want[uid] = (len(rows), rounded)
    assert got == want


def test_scd2_intervals_match_python_run_walk(spark, sf_dir):
    from cyrela_etl_spark.queries.temporalq import temporal_scd2_intervals

    got = {
        (r["user_id"], r["run_id"]): (
            r["attr_value"], _iso(r["valid_from"]), _iso(r["valid_to"]), r["n_events"]
        )
        for r in temporal_scd2_intervals(spark, sf_dir).collect()
    }
    ev = _events(sf_dir)
    want = {}
    for uid, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(index=False), key=lambda r: (r.ts, r.event_id))
        runs: list[list] = []  # [attr, first_ts, n]
        for r in rows:
            if not runs or runs[-1][0] != r.event_type:
                runs.append([r.event_type, r.ts, 0])
            runs[-1][2] += 1
        for i, (attr, first_ts, n) in enumerate(runs):
            valid_to = runs[i + 1][1].isoformat() if i + 1 < len(runs) else None
            want[(uid, i + 1)] = (attr, first_ts.isoformat(), valid_to, n)
    assert got == want
