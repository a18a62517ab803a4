"""Distributed chunking operator — pandas UDF → array<struct> → explode.

One Arrow-batched UDF runs the full preprocess+split+span kernel per turn
(reference flow: chunk_document, src/core/chunk/chunker.py:233-309 →
langchain_chunker.py:171-287) and returns the chunk list as a typed array of
structs. ``chunk_index`` comes from the in-string position inside the UDF —
never from row arrival order — so output is deterministic under any
partitioning/shuffle. Exploding with ``F.inline`` keeps everything in one
narrow stage: scan → UDF → explode → write, zero shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from ragstudio_spark.kernel import chunk as kchunk

CHUNK_STRUCT = StructType(
    [
        StructField("chunk_index", IntegerType()),
        StructField("chunk_id", StringType()),
        StructField("text", StringType()),
        StructField("char_start", IntegerType()),
        StructField("char_end", IntegerType()),
        StructField("char_length", IntegerType()),
        StructField("token_count", IntegerType()),
        StructField("sentence_count", IntegerType()),
        StructField("total_chunks", IntegerType()),
        StructField("chunking_strategy", StringType()),
        StructField("requested_strategy", StringType()),
        StructField("chunk_size", IntegerType()),
        StructField("chunk_overlap", IntegerType()),
    ]
)

CHUNK_RESULT_SCHEMA = StructType(
    [
        StructField("chunks", ArrayType(CHUNK_STRUCT)),
        StructField("extraction_fixes", IntegerType()),
        StructField("page_numbers_removed", IntegerType()),
    ]
)

_FIELD_NAMES = [f.name for f in CHUNK_STRUCT.fields]


def make_chunk_udf(do_preprocess: bool = True, adaptive: bool = False):
    @F.pandas_udf(CHUNK_RESULT_SCHEMA)
    def _chunk_udf(
        text: pd.Series,
        source: pd.Series,
        strategy: pd.Series,
        max_tokens: pd.Series,
        overlap: pd.Series,
    ) -> pd.DataFrame:
        out_chunks, out_fixes, out_removed = [], [], []
        for t, src, strat, mt, ov in zip(text, source, strategy, max_tokens, overlap):
            chunks, stats = kchunk.chunk_turn(
                t or "",
                source=src,
                requested_strategy=strat,
                max_tokens=int(mt),
                overlap=int(ov),
                do_preprocess=do_preprocess,
                adaptive=adaptive,
            )
            out_chunks.append([tuple(c[k] for k in _FIELD_NAMES) for c in chunks])
            out_fixes.append(stats["extraction_fixes"])
            out_removed.append(stats["page_numbers_removed"])
        return pd.DataFrame(
            {
                "chunks": out_chunks,
                "extraction_fixes": out_fixes,
                "page_numbers_removed": out_removed,
            }
        )

    return _chunk_udf


def with_chunks(
    df: DataFrame,
    text_col: str = "extracted_text",
    strategy_col=None,
    max_tokens_col=None,
    overlap_col=None,
    do_preprocess: bool = True,
    adaptive: bool = False,
    out_col: str = "chunk_result",
) -> DataFrame:
    """Attach the chunk_result struct. Strategy/size/overlap can be columns
    (adaptive mode) or None → reference defaults recursive/400/50
    (src/core/config/defaults.py:10-16)."""
    udf = make_chunk_udf(do_preprocess=do_preprocess, adaptive=adaptive)
    source = F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"))
    return df.withColumn(
        out_col,
        udf(
            F.col(text_col),
            source,
            strategy_col if strategy_col is not None else F.lit("recursive"),
            max_tokens_col if max_tokens_col is not None else F.lit(400),
            overlap_col if overlap_col is not None else F.lit(50),
        ),
    )


def explode_chunks(df: DataFrame, result_col: str = "chunk_result") -> DataFrame:
    """Flatten to one row per chunk, carrying turn identity + stats."""
    keep = [c for c in df.columns if c != result_col]
    return (
        df.select(
            *keep,
            F.col(f"{result_col}.extraction_fixes").alias("extraction_fixes"),
            F.col(f"{result_col}.page_numbers_removed").alias("page_numbers_removed"),
            F.explode(F.col(f"{result_col}.chunks")).alias("chunk"),
        )
        .select(*keep, "extraction_fixes", "page_numbers_removed", "chunk.*")
    )
