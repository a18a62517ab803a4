"""Lineage, extraction-metrics, and checkpointed resume.

Reproduces the reference's run-history + retry semantics (src/core/pipeline/
history.py:22-106,311-328; retry.py:27-140) with table-native primitives:

* every run writes chunks / metrics / quarantine under ``<root>/runs/<run_id>/``
  and a per-partition **lineage** table (run_id, partition_id, turn counts by
  status, ts) — the FileResult/PipelineRun analogue;
* a run directory only counts as committed when its ``_COMMITTED`` marker
  exists (written after all tables land) — the parquet emulation of an
  atomic Iceberg snapshot commit. On a real deployment these writes are
  Iceberg ``append`` snapshots and the marker is the snapshot itself;
* **resume** = LEFT ANTI JOIN of the input against the union of committed
  runs' successful turn keys — a restarted job processes only uncommitted
  ``(conv_id, turn_idx)``, and the final chunks table equals a single-run
  output (verified in tests).

The anti-join is the only shuffle the resume path adds. The committed-keys
side is **unbounded** at the 100 TB design point (a crash at 60% of a 10¹²-
turn run leaves ~10¹¹ committed keys), so we never force a broadcast blindly:
the key count is estimated for free from the committed runs' ``run.json``
summaries (no Spark job), and the broadcast hint is applied only when the
estimate is under ``BROADCAST_MAX_KEYS`` — above it the join is a plain
shuffle anti-join and AQE may still choose broadcast at runtime from actual
sizes. Mirrors the reference's retry-set semantics
(src/core/pipeline/history.py:311-328) with a scale guard it never needed
single-node.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ragstudio_spark.pipeline.job import PipelineConfig, PipelineOutput, run_pipeline

COMMIT_MARKER = "_COMMITTED"

# Broadcasting the committed/retry key set is only safe when it is small.
# 1M (conv_id, turn_idx) keys ≈ tens of MB serialized — comfortably inside
# executor broadcast budgets; past that the anti-join runs as a shuffle
# join (AQE can still downgrade it to broadcast from *measured* sizes).
BROADCAST_MAX_KEYS = 1_000_000


def run_summaries(root: str) -> list[dict]:
    """run.json summaries of committed runs, oldest first (pure file reads)."""
    out = []
    for run_id in committed_runs(root):
        path = os.path.join(_run_dir(root, run_id), "run.json")
        if os.path.exists(path):
            with open(path) as f:
                out.append(json.load(f))
    return out


def estimated_committed_turns(root: str) -> int:
    """Upper bound on committed (conv_id, turn_idx) keys, from run.json
    counters — free (no Spark job), and an over-estimate when runs overlap
    (distinct() shrinks the real set), which errs on the safe side."""
    return sum(r.get("total_turns", 0) for r in run_summaries(root))


def maybe_broadcast(keys: DataFrame, estimated_keys: int,
                    max_keys: int = BROADCAST_MAX_KEYS) -> DataFrame:
    """Broadcast-hint ``keys`` only when the estimate fits the budget."""
    return F.broadcast(keys) if estimated_keys <= max_keys else keys


def resume_filter(spark: SparkSession, transcripts: DataFrame, root: str,
                  max_broadcast_keys: int = BROADCAST_MAX_KEYS) -> DataFrame:
    """Anti-join the input against committed turn keys (the resume step),
    size-guarding the broadcast hint."""
    done = committed_turn_keys(spark, root)
    if done is None:
        return transcripts
    done = maybe_broadcast(done, estimated_committed_turns(root), max_broadcast_keys)
    return transcripts.join(done, on=["conv_id", "turn_idx"], how="left_anti")


def _run_dir(root: str, run_id: str) -> str:
    return os.path.join(root, "runs", run_id)


def committed_runs(root: str) -> list[str]:
    runs_root = os.path.join(root, "runs")
    if not os.path.isdir(runs_root):
        return []
    return sorted(
        r for r in os.listdir(runs_root)
        if os.path.exists(os.path.join(runs_root, r, COMMIT_MARKER))
    )


def read_table(spark: SparkSession, root: str, table: str) -> DataFrame | None:
    """Union of a table across all committed runs."""
    paths = [
        os.path.join(_run_dir(root, r), table)
        for r in committed_runs(root)
        if os.path.isdir(os.path.join(_run_dir(root, r), table))
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def committed_turn_keys(spark: SparkSession, root: str) -> DataFrame | None:
    """(conv_id, turn_idx) of turns already processed (any terminal status:
    success / empty / failed_quality — matching the reference, which retries
    only FAILED/SKIPPED transient errors, not quality rejections)."""
    metrics = read_table(spark, root, "metrics")
    if metrics is None:
        return None
    return metrics.select("conv_id", "turn_idx").distinct()


def run_with_lineage(
    spark: SparkSession,
    transcripts: DataFrame,
    root: str,
    run_id: str,
    config: PipelineConfig | None = None,
    resume: bool = True,
    max_broadcast_keys: int = BROADCAST_MAX_KEYS,
) -> dict:
    """Execute the pipeline with lineage + resume; returns run summary."""
    t0 = time.time()
    df = transcripts
    if resume:
        df = resume_filter(spark, df, root, max_broadcast_keys)

    out: PipelineOutput = run_pipeline(df, config)
    run_dir = _run_dir(root, run_id)

    # stamp partition id before the write so lineage reflects physical layout
    metrics_with_pid = out.metrics.withColumn("partition_id", F.spark_partition_id())
    metrics_with_pid.write.mode("overwrite").parquet(os.path.join(run_dir, "metrics"))
    # stable (conv_id, turn_idx, chunk_index) layout inside each file: a
    # local sort (no shuffle) — predictable reader order + better parquet
    # RLE/dictionary compression on the key columns
    out.chunks.sortWithinPartitions("conv_id", "turn_idx", "chunk_index").write.mode(
        "overwrite").parquet(os.path.join(run_dir, "chunks"))
    out.quarantine.write.mode("overwrite").parquet(os.path.join(run_dir, "quarantine"))
    if out.tool_calls is not None:
        out.tool_calls.write.mode("overwrite").parquet(
            os.path.join(run_dir, "tool_calls"))

    lineage = (
        spark.read.parquet(os.path.join(run_dir, "metrics"))
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("total_turns"),
            F.sum(F.when(F.col("status") == "success", 1).otherwise(0)).alias("success"),
            F.sum(F.when(F.col("status").isin("failed_quality", "failed_error"), 1)
                  .otherwise(0)).alias("failed"),
            F.sum(F.when(F.col("status").isin("empty", "skipped"), 1)
                  .otherwise(0)).alias("skipped"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("ts", F.current_timestamp())
    )
    lineage.write.mode("overwrite").parquet(os.path.join(run_dir, "lineage"))

    summary_rows = lineage.agg(
        F.sum("total_turns").alias("total"),
        F.sum("success").alias("success"),
        F.sum("failed").alias("failed"),
        F.sum("skipped").alias("skipped"),
    ).collect()[0]
    summary = {
        "run_id": run_id,
        "total_turns": summary_rows["total"] or 0,
        "success": summary_rows["success"] or 0,
        "failed": summary_rows["failed"] or 0,
        "skipped": summary_rows["skipped"] or 0,
        "duration_s": round(time.time() - t0, 3),
        "status": "completed",
    }
    with open(os.path.join(run_dir, "run.json"), "w") as f:
        json.dump(summary, f)
    # atomic-commit marker: written only after every table landed
    with open(os.path.join(run_dir, COMMIT_MARKER), "w") as f:
        f.write(run_id)
    return summary


def read_chunks(spark: SparkSession, root: str) -> DataFrame | None:
    """The logical chunks table = union of committed snapshots."""
    return read_table(spark, root, "chunks")
