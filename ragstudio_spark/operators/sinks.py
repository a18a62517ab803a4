"""Export sinks: JSON / JSONL / CSV chunk exports with metadata handling.

Reproduces the reference's save_chunks formats (src/core/cli/utils/
output.py:16-93) and the per-document vs combined layouts
(batch.py:435-449, 591-604; json_exporter.py:60-179):

* JSON/JSONL records carry ``{id, text, metadata{...}}``; here metadata is a
  typed struct assembled from the chunk columns (the PG chunks-table schema,
  models.py:134-200, is the field contract).
* CSV flattens metadata into columns and strips newlines from text
  (output.py:73-93).
* ``partitioned=True`` writes one directory per conv_id bucket — the
  distributed analogue of per-file ``{stem}_chunks.jsonl`` output; False
  writes a single combined dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_META_FIELDS = (
    "chunk_index", "total_chunks", "char_start", "char_end", "char_length",
    "token_count", "sentence_count", "chunking_strategy", "requested_strategy",
    "chunk_size", "chunk_overlap", "extraction_fixes", "page_numbers_removed",
)


def chunk_records(chunks: DataFrame) -> DataFrame:
    """Shape exploded chunks into export records {id, text, metadata}."""
    meta_cols = [F.col(f).alias(f) for f in _META_FIELDS if f in chunks.columns]
    return chunks.select(
        F.col("chunk_id").alias("id"),
        F.col("text"),
        F.struct(
            F.concat_ws(":", F.col("conv_id"), F.col("turn_idx")).alias("source"),
            *meta_cols,
        ).alias("metadata"),
    )


def write_jsonl(chunks: DataFrame, path: str, partitioned: bool = False,
                n_buckets: int = 64) -> None:
    """JSONL export (one JSON object per line — Spark's native json sink)."""
    records = chunk_records(chunks)
    if partitioned:
        records = records.withColumn(
            "conv_bucket", F.pmod(F.xxhash64(F.col("metadata.source")), F.lit(n_buckets))
        )
        records.write.mode("overwrite").partitionBy("conv_bucket").json(path)
    else:
        records.write.mode("overwrite").json(path)


def write_csv(chunks: DataFrame, path: str) -> None:
    """CSV export: metadata flattened to top-level columns, newlines
    stripped from text (output.py:73-93 contract)."""
    records = chunk_records(chunks)
    flat = records.select(
        "id",
        F.regexp_replace(F.col("text"), r"[\n\r]+", " ").alias("text"),
        F.col("metadata.source").alias("source"),
        *[F.col(f"metadata.{f}").alias(f) for f in _META_FIELDS
          if f"metadata.{f}" in [f"metadata.{x}" for x in _META_FIELDS]
          and f in records.select("metadata.*").columns],
    )
    flat.write.mode("overwrite").option("header", True).csv(path)


def read_jsonl(spark, path: str) -> DataFrame:
    """Round-trip import (json_exporter.py import path)."""
    return spark.read.json(path)
