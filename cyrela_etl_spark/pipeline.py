"""Pipeline runner: ordered stages with per-stage retry (reference S13).

The reference sequences its stages as an Airflow DAG with a retry policy
(1 retry / 5-min delay, reference dags/s3-etl-wallet-csv.py:38-39) and the
topology sensor >> list >> copy >> delete >> parse >> {spark job, DW load}
(reference dags/s3-etl-wallet-csv.py:247-248), passing state via XCom.
Here the same contract is a plain Python runner: stages run in declared
order, each with its own retry budget; state passes through a shared
context dict (the XCom analogue); scheduling stays external (cron/Airflow
can call ``Pipeline.run`` — per BASELINE "Spark transforms + scheduled
jobs", orchestration is not the engine's job).

Scale note: the runner is driver-side control flow only — every stage body
is expected to be a lazy Spark action over distributed data. Nothing here
holds rows.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


class PipelineError(RuntimeError):
    """A stage exhausted its retries; carries the failing stage name."""

    def __init__(self, stage: str, attempts: int, cause: Exception):
        super().__init__(f"stage {stage!r} failed after {attempts} attempt(s): {cause}")
        self.stage = stage
        self.attempts = attempts
        self.cause = cause


@dataclass
class Stage:
    """One pipeline step.

    ``fn(ctx)`` receives the shared mutable context dict and may read
    upstream results from it / publish its own under ``ctx[name]``
    (returned value is stored there automatically).
    """

    name: str
    fn: Callable[[dict[str, Any]], Any]
    retries: int = 1          # extra attempts after the first failure
    retry_delay_s: float = 0.0  # reference uses 300s; tests use 0


@dataclass
class StageResult:
    name: str
    attempts: int
    seconds: float
    value: Any = None


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)

    def stage(self, name: str, retries: int = 1, retry_delay_s: float = 0.0):
        """Decorator form: ``@pipe.stage("parse")``."""

        def deco(fn: Callable[[dict[str, Any]], Any]):
            self.stages.append(Stage(name, fn, retries, retry_delay_s))
            return fn

        return deco

    def run(self, ctx: dict[str, Any] | None = None) -> list[StageResult]:
        """Run all stages in order; returns per-stage results.

        A stage is retried up to ``retries`` extra times; once exhausted the
        pipeline stops with PipelineError (downstream stages don't run —
        the reference's depends-on-past=off, trigger-rule=all-success
        default)."""
        ctx = ctx if ctx is not None else {}
        results: list[StageResult] = []
        for st in self.stages:
            t0 = time.perf_counter()
            attempt = 0
            while True:
                attempt += 1
                try:
                    value = st.fn(ctx)
                    break
                except Exception as e:  # noqa: BLE001 — stage bodies are arbitrary
                    if attempt > st.retries:
                        raise PipelineError(st.name, attempt, e) from e
                    if st.retry_delay_s:
                        time.sleep(st.retry_delay_s)
            ctx[st.name] = value
            results.append(StageResult(st.name, attempt, time.perf_counter() - t0, value))
        return results


def observed(df, name: str, *metrics):
    """Attach zero-cost pipeline metrics to a DataFrame: returns
    (df_with_observation, Observation). The metrics (any aggregate
    expressions — row counts, null counts, value bounds) are computed ON
    THE SAME PASS as whatever action materializes the DataFrame — no
    second scan, unlike a separate ``df.count()`` / quality query. Read
    ``obs.get`` AFTER the action. This is the data-quality hook a
    production stage wires between transform and sink (e.g. assert
    null-rate below threshold before promoting a zone).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
