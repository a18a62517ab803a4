"""Corpus curation — the composed clean-room step of an LLM training-data
pipeline, as ONE DataFrame flow:

    exact dedup (canonical per text hash)
      → PII redaction (+ per-category audit counts)
        → token estimate over the REDACTED text
          → fixed-budget sequence packing per shard

Each stage is an already-oracle-gated operator (dedupe / redact /
packing); this module is their composition, itself oracle-gated end to
end (`curate_corpus` query): the DuckDB twin replays the same four
stages in SQL and the result hashes must match byte-for-byte.

Order matters and is part of the contract: dedup FIRST (identical texts
redact identically, so deduping first only removes redundant work),
redaction BEFORE token counting (a training pipeline packs what it
ships — the scrubbed text), packing LAST over a per-shard window (no
global window; see operators/packing.py).

Scale shape: one hash-partitioned shuffle (dedup window), one codegen'd
projection (redaction chain), one per-shard window (packing). No Python,
no collect, no broadcast needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ragstudio_spark.operators import packing
from ragstudio_spark.operators import redact as redact_op

#: chars-per-token heuristic shared with the pack_sequences entry
CHARS_PER_TOKEN = 4


def curate_corpus(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shard_col: str = "lang",
                  budget: int = 2048) -> DataFrame:
    """Curated corpus rows: one per kept document, with redaction audit
    counts, the redacted text, its token estimate, and the training
    sequence assignment (``seq_index``/``seq_token_offset`` within the
    document's shard). Ties in the dedup window break on lowest id —
    deterministic across partitionings."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.asc(id_col))
    canonical = (df.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1).drop("_rn"))
    red = redact_op.with_redaction(canonical, text_col)
    toks = red.withColumn(
        "token_count",
        F.expr(f"length(redacted_text) div {CHARS_PER_TOKEN}")
        .cast("bigint"))
    return packing.pack_chunks(
        toks, budget=budget, partition_col=shard_col,
        order_cols=(id_col,), token_col="token_count")


def curation_report(curated: DataFrame,
                    shard_col: str = "lang") -> DataFrame:
    """Per-shard curation manifest: kept docs, total tokens, sequences,
    and redaction totals — the audit table a curation run keeps. One
    partial-aggregated groupBy."""
    aggs = [
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("token_count").cast("bigint").alias("n_tokens"),
        (F.max("seq_index") + 1).cast("bigint").alias("n_sequences"),
    ]
    for cat, _p, _r in redact_op.REDACTIONS:
        aggs.append(F.sum(f"n_{cat}").cast("bigint").alias(f"n_{cat}"))
    return curated.groupBy(shard_col).agg(*aggs)
