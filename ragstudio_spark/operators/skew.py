"""Skew handling: salting + size-aware rebalancing for skewed conversations.

The transcript workload's skew axes (SURVEY.md §4):

* a few conversations are 100-2000× longer than the median (Zipf tail) — any
  *per-conversation* wide op (groupBy conv_id) pins one task;
* per-row text sizes vary 100×, so equal-row partitions are unequal work for
  the pandas-UDF stages.

Remedies, all deterministic:

* ``with_salt``              — ``salt = pmod(xxhash64(conv_id, turn_idx), n)``;
  pre-aggregate per (conv_id, salt) then merge per conv_id (two-phase agg).
* ``salted_conv_agg``        — that two-phase count/sum aggregation.
* ``rebalance_by_size``      — repartitionByRange on (length bucket, hash)
  spreads giant turns across tasks before UDF-heavy stages.

The extract+chunk hot path itself needs none of this (it is per-turn
embarrassingly parallel); these utilities protect the aggregation/export
tiers (per-conversation stats, per-conv exports) at the 10^12-turn design
point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int = 32, cols: tuple[str, ...] = ("conv_id", "turn_idx")) -> DataFrame:
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")
    )


def salted_conv_agg(df: DataFrame, value_col: Column, n_salts: int = 32) -> DataFrame:
    """Two-phase skew-safe per-conversation aggregation:
    (conv_id, salt) partial → conv_id final. Returns conv_id, n_rows, total."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy("conv_id", "salt").agg(
        F.count("*").alias("pn"), F.sum(value_col).alias("pt")
    )
    return partial.groupBy("conv_id").agg(
        F.sum("pn").alias("n_rows"), F.sum("pt").alias("total")
    )


def assemble_conversations(
    df: DataFrame,
    text_col: str = "text",
    sep: str = "\n\n",
    bucket_size: int = 64,
) -> DataFrame:
    """Turn-ordered conversation assembly (turns → one document per
    conversation), skew-safe via two-phase ordered concatenation:

      phase 1: partial concat per (conv_id, turn_idx // bucket_size) —
               a 2000-turn outlier becomes ~32 bucket rows processed by
               different tasks instead of one giant collect_list;
      phase 2: concat the (few) bucket rows per conversation in bucket
               order.

    Ordering comes from (bucket, turn_idx) sort keys inside array_sort —
    deterministic under any shuffle. Returns (conv_id, n_turns, doc_text).
    """
    bucket = (F.col("turn_idx") / bucket_size).cast("int")
    partial = (
        df.withColumn("bucket", bucket)
        .groupBy("conv_id", "bucket")
        .agg(
            F.count("*").alias("pn"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("turn_idx"), F.coalesce(F.col(text_col), F.lit("")).alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                ),
                sep,
            ).alias("ptext"),
        )
    )
    return (
        partial.groupBy("conv_id")
        .agg(
            F.sum("pn").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("bucket"), F.col("ptext").alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                sep,
            ).alias("doc_text"),
        )
    )


def rebalance_by_size(df: DataFrame, text_col: str = "text",
                      num_partitions: int | None = None) -> DataFrame:
    """Range-partition on (log-size bucket, row hash): giant turns spread
    uniformly, small turns pack densely — equalizes pandas-UDF batch cost."""
    bucket = F.floor(F.log2(F.greatest(F.length(F.col(text_col)), F.lit(1))))
    spread = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(1 << 20))
    if num_partitions:
        return df.repartitionByRange(num_partitions, bucket, spread)
    return df.repartitionByRange(bucket, spread)
