"""Table maintenance for append-only parquet outputs — the compaction /
dedup pass every streaming sink in this engine assumes its READERS can
rely on.

The streaming jobs (streaming/jobs.py) append with foreachBatch, which
is at-least-once under mid-batch crash retry: their docstrings tell
readers to "dedup on doc_id". This module is that tool, plus the
small-file compaction a long-running stream needs anyway (hundreds of
micro-batches → hundreds of sub-MB files → the task-granularity tax
CLAUDE.md documents at 1.4×):

    read dir → (optional) deterministic key-dedup → coalesce to
    target_files → write to a sibling tmp dir → swap + _COMMITTED marker

The swap is the engine's documented Iceberg-snapshot emulation (the
lineage.py pattern): on a real deployment this operation is
``rewrite_data_files`` / ``REPLACE TABLE AS SELECT`` in one snapshot
commit; here the _COMMITTED marker plus directory swap gives the same
observable contract — a reader either sees the whole old state or the
whole new state, and an interrupted compaction leaves the original
directory untouched (the half-written tmp dir has no marker and is
swept by the next attempt).

Dedup determinism: ``dropDuplicates`` keeps an ARBITRARY row per key —
fine for byte-identical retry copies, wrong the moment two versions of
a key differ. The dedup here keeps the row that sorts FIRST over all
non-key columns (row_number window), so repeated compactions of the
same directory state produce byte-identical results regardless of
partitioning.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession, Window, functions as F

from ragstudio_spark.pipeline.lineage import COMMIT_MARKER


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    dedup_keys: list[str] | None = None,
    target_files: int = 8,
    partition_by: str | None = None,
) -> dict:
    """Compact (and optionally key-dedup) a parquet directory in place.
    Returns {"rows", "files_before", "files_after"}.

    ``partition_by`` preserves a partitioned layout (e.g. the IVF-PQ
    index's cell directories) — ``target_files`` then applies PER
    PARTITION via repartition on the partition column."""
    df = spark.read.parquet(path)
    files_before = sum(
        1 for _r, _d, fs in os.walk(path) for f in fs
        if f.endswith(".parquet"))
    if dedup_keys:
        others = [c for c in df.columns if c not in dedup_keys]
        w = Window.partitionBy(*dedup_keys).orderBy(
            *[F.asc_nulls_first(c) for c in others] or [F.lit(1)])
        df = (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))

    tmp = f"{path.rstrip('/')}._compact_{uuid.uuid4().hex[:8]}"
    writer = df.repartition(target_files, partition_by) if partition_by \
        else df.coalesce(target_files)
    if partition_by:
        writer.write.partitionBy(partition_by).parquet(tmp)
    else:
        writer.write.parquet(tmp)
    with open(os.path.join(tmp, COMMIT_MARKER), "w") as f:
        f.write("compacted\n")

    rows = spark.read.parquet(tmp).count()
    old = f"{path.rstrip('/')}._old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    files_after = sum(
        1 for _r, _d, fs in os.walk(path) for f in fs
        if f.endswith(".parquet"))
    return {"rows": rows, "files_before": files_before,
            "files_after": files_after}


def sweep_stale_compactions(path: str) -> int:
    """Remove abandoned ``._compact_*`` / ``._old_*`` siblings (a crash
    between write and swap leaves them; they carry no commit marker or
    are already superseded). Returns the number removed."""
    parent = os.path.dirname(path.rstrip("/")) or "."
    base = os.path.basename(path.rstrip("/"))
    removed = 0
    for entry in os.listdir(parent):
        if entry.startswith((f"{base}._compact_", f"{base}._old_")):
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
            removed += 1
    return removed
