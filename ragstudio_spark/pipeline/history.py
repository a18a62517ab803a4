"""Run-history API + retry/backoff policy.

Table-native port of the reference's run-history manager and retry engine:

* ``list_runs`` / ``run_summary``        — history.py:124-193, 379-418
* ``last_failed_run``                    — history.py:288-309 (most recent
  run with failures, reverse scan)
* ``retry_turn_keys``                    — history.py:311-328 (turns whose
  LAST status is failed/skipped — status in a later run supersedes earlier)
* ``backoff_delays`` / ``retry_call``    — retry.py:26-177: max_attempts=3,
  base 1s doubling, cap 30s, optional deterministic jitter; FatalError
  short-circuits. Presets: retry.py:222-246.

Spark-side note: *task-level* transient faults are already retried by
``spark.task.maxFailures``; this module covers the *job/run* tier — rerun
only what a previous run left failed, with the reference's pacing.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, Window

from ragstudio_spark.pipeline import lineage as _lineage


class FatalError(Exception):
    """Non-retryable failure (short-circuits retry_call)."""


@dataclass
class RetryConfig:
    max_attempts: int = 3
    base_delay_s: float = 1.0
    max_delay_s: float = 30.0
    jitter: bool = False


PRESETS = {
    "standard": RetryConfig(),
    "aggressive": RetryConfig(max_attempts=5, base_delay_s=0.5, max_delay_s=10.0),
    "patient": RetryConfig(max_attempts=3, base_delay_s=5.0, max_delay_s=60.0),
}


def backoff_delays(cfg: RetryConfig, attempts: int | None = None, seed: str = "") -> list[float]:
    """Exponential delays 1s,2s,4s… capped; jitter (when on) is
    deterministic in ``seed`` so retries stay reproducible."""
    n = (attempts if attempts is not None else cfg.max_attempts) - 1
    delays = []
    for i in range(max(n, 0)):
        d = min(cfg.base_delay_s * (2 ** i), cfg.max_delay_s)
        if cfg.jitter:
            h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
            d *= 0.5 + (h / 0xFFFFFFFF)  # ×[0.5, 1.5)
        delays.append(d)
    return delays


def retry_call(fn, cfg: RetryConfig | None = None, seed: str = "", sleep=time.sleep):
    """Call ``fn`` with backoff; FatalError propagates immediately."""
    cfg = cfg or RetryConfig()
    delays = backoff_delays(cfg, seed=seed)
    last_exc: Exception | None = None
    for attempt in range(cfg.max_attempts):
        try:
            return fn()
        except FatalError:
            raise
        except Exception as exc:  # noqa: BLE001
            last_exc = exc
            if attempt < len(delays):
                sleep(delays[attempt])
    raise last_exc  # type: ignore[misc]


# --- run history over committed lineage -----------------------------------

def list_runs(root: str) -> list[dict]:
    """Committed run summaries, oldest first."""
    out = []
    for run_id in _lineage.committed_runs(root):
        path = os.path.join(root, "runs", run_id, "run.json")
        if os.path.exists(path):
            with open(path) as f:
                out.append(json.load(f))
    return out


def last_failed_run(root: str) -> dict | None:
    """Most recent run that recorded failures (reverse scan)."""
    for run in reversed(list_runs(root)):
        if run.get("failed", 0) > 0:
            return run
    return None


def retry_turn_keys(spark: SparkSession, root: str,
                    statuses: tuple[str, ...] = ("failed_quality", "failed_error",
                                                 "skipped")) -> DataFrame | None:
    """(conv_id, turn_idx) whose *latest* status is retryable. A turn's
    newest metrics row wins (runs are ordered by run directory name)."""
    runs = _lineage.committed_runs(root)
    if not runs:
        return None
    frames = []
    for order, run_id in enumerate(runs):
        path = os.path.join(root, "runs", run_id, "metrics")
        if os.path.isdir(path):
            frames.append(
                spark.read.parquet(path).select(
                    "conv_id", "turn_idx", "status"
                ).withColumn("run_order", F.lit(order))
            )
    if not frames:
        return None
    metrics = frames[0]
    for f_ in frames[1:]:
        metrics = metrics.unionByName(f_)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("run_order"))
    latest = (
        metrics.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return latest.filter(F.col("status").isin(list(statuses))).select(
        "conv_id", "turn_idx"
    )


def estimated_retry_turns(root: str) -> int:
    """Upper bound on retryable keys: failed+skipped counters summed across
    committed run.json summaries (pure file reads, no Spark job)."""
    return sum(r.get("failed", 0) + r.get("skipped", 0)
               for r in _lineage.run_summaries(root))


def retry_subset(spark: SparkSession, transcripts: DataFrame, root: str,
                 max_broadcast_keys: int = _lineage.BROADCAST_MAX_KEYS,
                 ) -> DataFrame | None:
    """Semi-join the input to the retryable key set, size-guarding the
    broadcast hint — after a large-scale partial failure the retry set can
    be arbitrarily big, so the hint is applied only under the estimate."""
    keys = retry_turn_keys(spark, root)
    if keys is None:
        return None
    keys = _lineage.maybe_broadcast(keys, estimated_retry_turns(root),
                                    max_broadcast_keys)
    return transcripts.join(keys, on=["conv_id", "turn_idx"], how="left_semi")


def retry_failed(spark: SparkSession, transcripts: DataFrame, root: str,
                 run_id: str, config=None,
                 max_broadcast_keys: int = _lineage.BROADCAST_MAX_KEYS) -> dict:
    """``ragctl retry`` analogue: reprocess only turns whose latest status
    is retryable (semi-join), appending a new committed run."""
    subset = retry_subset(spark, transcripts, root, max_broadcast_keys)
    if subset is None:
        return _lineage.run_with_lineage(spark, transcripts, root, run_id, config)
    return _lineage.run_with_lineage(
        spark, subset, root, run_id, config, resume=False
    )
