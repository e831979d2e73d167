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

from bench import PROBE_REF, calibrate


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
