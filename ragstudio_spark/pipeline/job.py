"""End-to-end extract+chunk pipeline (the engine's flagship job).

Dataflow (reference lifecycle §3.2/§3.3 of SURVEY.md — batch_command and
IngestionPipelineWithMetadata.ingest_document):

    transcripts
      → sniff content_type            (column exprs)
      → extract main content          (one pandas UDF, per-type dispatch)
      → [optional] normalize metrics  (language, OCR quality)
      → strategy                      (fixed reference default, or adaptive
                                       profile → when() ladder)
      → chunk                         (pandas UDF → array<struct>)
      → quality gate on chunk array   (JVM exprs, zero shuffle)
      → split: chunks (exploded) / quarantine / per-turn metrics

The whole hot path is a single narrow stage: no joins, no aggregations, no
shuffles — each turn is independent, so the plan scales linearly with
executors and AQE/skew handling only matters at the write. Ordering
guarantees come from data (conv_id, turn_idx, chunk_index), not from task
scheduling.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ragstudio_spark.operators import chunker, extract, normalizer, profiler, quality_gate, sniff
from ragstudio_spark.operators import strategy as strategy_op


@dataclass
class PipelineConfig:
    strategy: str = "recursive"      # fixed strategy (reference default path)
    max_tokens: int = 400
    overlap: int = 50
    adaptive: bool = False           # profile-driven strategy selection
    preprocess: bool = True
    with_normalize: bool = True      # language + OCR-quality metrics columns
    apply_repair: bool = False       # rewrite text via OCR repair (ingest tier)
    language_filter: tuple | None = None  # e.g. ("fr", "en") drops other langs
    min_readable_ratio: float = 0.9
    chunk_min_ratio: float = 0.3


@dataclass
class PipelineOutput:
    chunks: DataFrame        # one row per chunk
    metrics: DataFrame       # one row per turn (extraction metrics table)
    quarantine: DataFrame    # failed/empty turns with reason


TURN_KEY = ("conv_id", "turn_idx")


def run_pipeline(transcripts: DataFrame, config: PipelineConfig | None = None) -> PipelineOutput:
    cfg = config or PipelineConfig()
    df = sniff.with_content_type(transcripts)
    df = extract.with_extracted_text(df)

    if cfg.with_normalize:
        df = normalizer.with_normalization(df, apply_repair=cfg.apply_repair)
        if cfg.apply_repair:
            df = df.withColumn("extracted_text", F.col("norm.normalized_text"))
        if cfg.language_filter:
            df = normalizer.filter_languages(df, allowed=cfg.language_filter)

    if cfg.adaptive:
        df = profiler.with_profile(df)
        df = strategy_op.with_strategy(df)
        df = chunker.with_chunks(
            df,
            strategy_col=F.col("strategy"),
            max_tokens_col=F.col("strategy_max_tokens"),
            overlap_col=F.col("strategy_overlap"),
            do_preprocess=cfg.preprocess,
            adaptive=True,
        )
    else:
        df = chunker.with_chunks(
            df,
            strategy_col=F.lit(cfg.strategy),
            max_tokens_col=F.lit(cfg.max_tokens),
            overlap_col=F.lit(cfg.overlap),
            do_preprocess=cfg.preprocess,
        )

    df = quality_gate.with_chunks_gate(
        df,
        min_readable_ratio=cfg.min_readable_ratio,
        chunk_min_ratio=cfg.chunk_min_ratio,
    )

    status = (
        F.when(F.trim(F.coalesce(F.col("text"), F.lit(""))) == "", F.lit("empty"))
        .when(F.col("gate_passed"), F.lit("success"))
        .otherwise(F.lit("failed_quality"))
    )
    df = df.withColumn("status", status)

    metrics_cols = [
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("content_type"),
        F.col("extraction_engine"),
        F.length(F.col("extracted_text")).cast("int").alias("total_chars"),
        F.col("chunk_result.extraction_fixes").alias("extraction_fixes"),
        F.col("chunk_result.page_numbers_removed").alias("page_numbers_removed"),
        F.col("total_chunks_gate").alias("total_chunks"),
        F.col("readable_chunks"),
        F.col("readable_ratio"),
        F.col("status"),
    ]
    if cfg.with_normalize:
        metrics_cols.extend(
            [
                F.col("norm.language").alias("language"),
                F.col("norm.quality_score").alias("quality_score"),
                F.col("norm.needs_repair").alias("needs_repair"),
                F.col("norm.repair_applied").alias("repair_applied"),
            ]
        )
    metrics = df.select(*metrics_cols)

    passing = df.filter(F.col("status") == "success")
    quarantine = df.filter(F.col("status") != "success").select(
        "conv_id", "turn_idx", "content_type", "status",
        F.col("readable_ratio").alias("readable_ratio"),
        F.substring(F.col("text"), 1, 200).alias("text_head"),
    )

    strategy_meta = (
        [F.col("strategy_reason").alias("chunking_reason")] if cfg.adaptive else []
    )
    chunks = chunker.explode_chunks(
        passing.select(
            "conv_id", "turn_idx", "content_type", "extraction_engine",
            "chunk_result", *strategy_meta,
        )
    )
    return PipelineOutput(chunks=chunks, metrics=metrics, quarantine=quarantine)
