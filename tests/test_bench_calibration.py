"""Pins for bench.py's host-calibration decision core (calibrate()).

Every fixture below is a REAL checkpoint series measured during the
round-12 instrument validation (13 unchanged-code bench runs at sf0.1
plus two deliberate burner experiments — NOTES.md round-12 bench
sections). The thresholds these tests pin (mode divergence 20%,
stability drift 45%, divergence cap 50%, ratio clamp 0.85) were
calibrated FROM these scenarios; if a future edit moves a threshold,
these tests force the measured evidence to be reconsidered, not
silently overridden.

No SparkSession needed — calibrate() is pure.
"""

from __future__ import annotations

import pytest

from bench import PROBE_REF, WEATHER_SUSPECT_RATIO, attribute_weather, calibrate


def _cal(checkpoints):
    return calibrate([tuple(c) for c in checkpoints])


# Run N (calm host, one absorbed transient at checkpoint 6): kernels
# agree -> throttle; drift 0.44 just under the measured 0.45 line.
RUN_N = [[0.847, 0.73], [0.861, 0.756], [0.935, 0.731], [0.972, 0.708],
         [1.008, 0.726], [1.125, 0.755], [0.779, 0.749]]

# Run H (live co-tenant core competition): the 32-way spark kernel reads
# 0.97-1.48 while the single-thread py kernel sits near ref -> kernels
# diverge -> contention mode -> the PY ratio normalizes (the sweep's raw
# inflation measured +8.9%, matching ratio_py 1.086; normalizing by
# ratio_spark 1.374 would fake a ~20% win).
RUN_H = [[1.475, 0.762], [1.107, 0.72], [1.028, 0.817], [1.131, 0.755],
         [1.18, 0.833], [1.109, 0.776], [0.966, 0.78]]

# Run I (contention episode DECAYING through the run, 1.395 -> 0.713):
# non-stationary -> must flag unstable regardless of mode.
RUN_I = [[1.395, 0.747], [0.949, 0.767], [0.964, 0.764], [0.997, 0.751],
         [1.046, 0.725], [0.878, 0.707], [0.713, 0.704]]


def test_calm_run_is_stable_throttle_mode():
    c = _cal(RUN_N)
    assert c["mode"] == "throttle"
    assert c["stable"] is True
    # throttle mode normalizes by the spark kernel
    assert c["host_ratio"] == pytest.approx(c["ratio_spark"])
    assert 0.4 < c["spark_drift"] <= 0.45


def test_contention_mode_selects_py_kernel():
    c = _cal(RUN_H)
    assert c["mode"] == "contention"
    assert c["kernel_divergence"] > 0.20
    # the sweep tracked ratio_py (~1.086) in this measured episode
    assert c["host_ratio"] == pytest.approx(c["ratio_py"])
    assert 1.05 < c["host_ratio"] < 1.12
    # spark ratio alone would have overcorrected ~25%
    assert c["ratio_spark"] > 1.3


def test_decaying_episode_flags_unstable():
    c = _cal(RUN_I)
    assert c["stable"] is False
    assert c["spark_drift"] > 0.45


def test_uniform_throttling_normalizes_by_common_ratio():
    # Synthetic whole-host 30% throttle: BOTH kernels slow together
    # (r11's descending-leg mode) — agree, stable, corrected.
    series = [[PROBE_REF["spark"] * 1.3, PROBE_REF["py"] * 1.3]] * 5
    c = _cal(series)
    assert c["mode"] == "throttle"
    assert c["stable"] is True
    assert c["host_ratio"] == pytest.approx(1.3)


def test_fast_host_ratio_clamped():
    # A host reading far faster than the pinned unit clamps at 0.85 so
    # normalization cannot manufacture regressions on a healthy host.
    series = [[PROBE_REF["spark"] * 0.6, PROBE_REF["py"] * 0.6]] * 4
    c = _cal(series)
    assert c["host_ratio"] == 0.85


def test_extreme_divergence_flags_unstable():
    # Beyond anything measured (spark 2x, py at ref): mode classifies as
    # contention but the 50% divergence cap marks the calibration itself
    # unreliable.
    series = [[PROBE_REF["spark"] * 2.0, PROBE_REF["py"]]] * 4
    c = _cal(series)
    assert c["mode"] == "contention"
    assert c["stable"] is False


# Run J (measured 2026-08-16, session 2: bench launched while the host
# was still draining a 35-minute pytest run — load average 5.0/7.8/11.2
# DESCENDING): the 32-way spark kernel recovers through the run
# (0.97 -> 0.65, drift 0.50) while the single-thread py kernel holds
# ~0.83 flat; kernels still agree on average (divergence 0.16 < 0.20)
# -> throttle mode, UNSTABLE flagged — exactly the "re-run before
# trusting normalized_total" case the flag exists for.
RUN_J = [[0.972, 0.957], [0.857, 0.845], [0.849, 0.811], [0.814, 0.827],
         [0.929, 0.839], [0.862, 0.835], [0.647, 0.819]]


def test_recovering_host_flags_unstable_in_throttle_mode():
    c = _cal(RUN_J)
    assert c["mode"] == "throttle"
    assert c["stable"] is False
    assert c["spark_drift"] > 0.45
    assert c["kernel_divergence"] < 0.20
    assert c["host_ratio"] == pytest.approx(c["ratio_spark"])


# --- round 16: the bw (memory-bandwidth) kernel ----------------------------
# 2-tuple series (every fixture above) must keep their exact pre-r16
# behavior: ratio_bw is None and mode can never be "bandwidth", so all
# historical normalized totals replay identically. 3-tuple series come
# from the round-16 bandwidth A/B (tools/ab_bandwidth_probe.py, NOTES
# round-16 table).


def test_legacy_two_tuple_series_unchanged():
    for series in (RUN_N, RUN_H, RUN_I, RUN_J):
        c = _cal(series)
        assert c["ratio_bw"] is None
        assert c["bw_over_cpu"] is None
        assert c["mode"] in ("throttle", "contention")


# Run BW (measured 2026-08-16, round-16 bandwidth A/B, two clean burn
# legs of the 16-stream copy-burner experiment; the third rep's idle leg
# was contaminated by a co-tenant and is excluded): bw kernel reads
# 2.1x its pin while the CPU kernels read their usual weather-level
# values. This in-guest burner also steals cores (16 of 32), so
# spark/py diverge 22% and the episode classifies CONTENTION — but the
# outcome is the measured-correct one either way: the PY ratio
# normalizes, and the A/B's paired sweep legs showed the sweep at
# ~1.0x (py 1.08x was the closest kernel; normalizing by the spark
# kernel's 1.21x inflation would have manufactured a fake ~20% win).
RUN_BW_BURN = [[1.124, 0.797, 0.519], [1.183, 0.833, 0.520]]


def test_bandwidth_burner_episode_normalizes_by_py():
    c = _cal(RUN_BW_BURN)
    assert c["ratio_bw"] > 2.0  # the witness the old kernels lack
    assert c["host_ratio"] == pytest.approx(c["ratio_py"])
    # the episode rode along 16 busy cores, so it classifies contention
    # here; a host-EXTERNAL bandwidth steal (no in-guest core theft)
    # classifies "bandwidth" — same normalizing kernel either way
    assert c["mode"] in ("contention", "bandwidth")


def test_pure_bandwidth_steal_names_bandwidth_mode():
    # Synthetic host-external bandwidth steal: both CPU kernels at their
    # pins (no core competition inside the guest, no frequency change),
    # bw kernel at 2x — the r13-r15 driver-round shape the 2-kernel
    # probe could not name. Mode = bandwidth; the py ratio normalizes
    # (measured choice, see RUN_BW_BURN), so an unmoved sweep is NOT
    # overcorrected by a bandwidth-inflated kernel.
    series = [[PROBE_REF["spark"], PROBE_REF["py"], PROBE_REF["bw"] * 2.0]] * 5
    c = _cal(series)
    assert c["mode"] == "bandwidth"
    assert c["stable"] is True
    assert c["bw_over_cpu"] == pytest.approx(2.0)
    # py at its pin -> ratio 1.0 -> clamped floor applies
    assert c["host_ratio"] == pytest.approx(max(0.85, c["ratio_py"]))


# Run K (measured 2026-08-16, round-16 smoke at sf0.01): checkpoint 2
# is a single all-kernel co-tenant transient — spark 1.7x, py 1.9x, bw
# 12.8x (3.141 s on a 0.245 s kernel). A MEAN bw ratio reads 2.9 and
# would name sustained bandwidth weather on an otherwise-calm run; the
# MEDIAN reads 1.04 (calm, correct). The blip still surfaces through
# the existing instability flag (spark drift 0.75 > 0.45).
RUN_K = [[0.757, 0.795, 0.246], [1.126, 1.356, 3.141], [0.794, 0.765, 0.342],
         [0.773, 0.789, 0.255], [0.801, 0.788, 0.461], [0.796, 0.783, 0.254],
         [0.644, 0.796, 0.245]]


def test_single_transient_cannot_fake_bandwidth_weather():
    c = _cal(RUN_K)
    assert c["ratio_bw"] == pytest.approx(0.255 / PROBE_REF["bw"], rel=1e-6)
    assert c["ratio_bw"] < 1.1  # median absorbs the 12.8x blip
    assert c["mode"] != "bandwidth"
    assert c["stable"] is False  # the blip still flags the run


def test_uniform_throttle_with_bw_kernel_stays_throttle():
    # Whole-host 30% slowdown moves all THREE kernels together: the bw
    # kernel must not reclassify genuine throttling as bandwidth weather.
    series = [[
        PROBE_REF["spark"] * 1.3, PROBE_REF["py"] * 1.3, PROBE_REF["bw"] * 1.3,
    ]] * 5
    c = _cal(series)
    assert c["mode"] == "throttle"
    assert c["bw_over_cpu"] == pytest.approx(1.0)
    assert c["host_ratio"] == pytest.approx(1.3)


def test_mixed_tuple_series_keeps_bw_witness():
    # ADVICE r16: a truncated/spliced DIAG replay mixing 2- and 3-tuples
    # silently disabled the bw witness (len(bw) == len(sp) guard) and
    # the resulting None crashed main()'s round(). Now the median runs
    # over whatever 3-tuples exist.
    import statistics

    mixed = [tuple(c) for c in RUN_K]
    mixed[1] = mixed[1][:2]  # drop the transient checkpoint's bw sample
    mixed[4] = mixed[4][:2]
    c = calibrate(mixed)
    want = statistics.median(
        [s[2] for s in mixed if len(s) > 2]
    ) / PROBE_REF["bw"]
    assert c["ratio_bw"] == pytest.approx(want)
    round(c["ratio_bw"], 3)  # main()'s report path must not TypeError


# --- round 17: per-query weather attribution (VERDICT r16 item 2) ----------
# The r16 driver round proved the need: the bw kernel recorded hot
# checkpoints (probe_sec bw max 10.76 s on a 0.245 s pin) but mapping
# the regressed query rows onto those windows was judge archaeology.
# attribute_weather() makes the artifact self-identifying: 0-based
# query i runs between checkpoints i//PROBE_EVERY and the next, the
# window ratio is the bounding-max per kernel, and suspect fires at
# WEATHER_SUSPECT_RATIO (1.5x — idle checkpoints read ~1.0-1.1, the
# measured contamination episodes 1.68-43x).

_CALM = (PROBE_REF["spark"], PROBE_REF["py"], PROBE_REF["bw"])


def test_attribute_weather_window_mapping_and_bw_flag():
    names = [f"q{i:02d}" for i in range(30)]
    hot = (PROBE_REF["spark"], PROBE_REF["py"], PROBE_REF["bw"] * 10.0)
    # cp0 before q00, cp1 after q11, cp2 after q23, cp3 final after q29
    w = attribute_weather(names, [_CALM, hot, _CALM, _CALM], probe_every=12)
    assert w["q00"]["window"] == [0, 1] and w["q11"]["window"] == [0, 1]
    assert w["q12"]["window"] == [1, 2] and w["q23"]["window"] == [1, 2]
    assert w["q24"]["window"] == [2, 3] and w["q29"]["window"] == [2, 3]
    # both windows touching the hot checkpoint flag; the last window not
    assert all(w[f"q{i:02d}"]["suspect"] for i in range(24))
    assert not any(w[f"q{i:02d}"]["suspect"] for i in range(24, 30))
    assert w["q00"]["ratio_bw"] == pytest.approx(10.0)
    assert w["q24"]["ratio_bw"] == pytest.approx(1.0)
    assert w["q24"]["ratio_spark"] == pytest.approx(1.0)


def test_attribute_weather_spark_kernel_flags_too():
    names = [f"q{i}" for i in range(4)]
    hot = (PROBE_REF["spark"] * WEATHER_SUSPECT_RATIO, PROBE_REF["py"], PROBE_REF["bw"])
    w = attribute_weather(names, [_CALM, hot], probe_every=12)
    assert all(w[n]["suspect"] for n in names)
    assert w["q0"]["ratio_spark"] == pytest.approx(WEATHER_SUSPECT_RATIO)


def test_attribute_weather_legacy_two_tuple_series():
    names = [f"q{i}" for i in range(3)]
    w = attribute_weather(
        names, [(0.85, 0.72), (0.90, 0.75)], probe_every=12
    )
    for n in names:
        assert w[n]["ratio_bw"] is None
        assert w[n]["suspect"] is False


def test_attribute_weather_short_subset_run():
    # SPARK_GRAFT_BENCH_ONLY with fewer queries than PROBE_EVERY: the
    # series is just [cp0, final]; every query shares the [0, 1] window
    # and indices never run past the checkpoint list.
    names = ["a", "b", "c"]
    w = attribute_weather(names, [_CALM, _CALM], probe_every=12)
    assert all(w[n]["window"] == [0, 1] for n in names)
    assert not any(w[n]["suspect"] for n in names)
