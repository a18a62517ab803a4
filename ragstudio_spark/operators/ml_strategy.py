"""ML chunking-strategy classifier — pure column expressions.

JVM twin of ``kernel.profile.predict_best_strategy`` (reference auto mode,
src/core/cli/commands/chunk.py:677-717; the reference's actual predictor
module is missing from its repo, so its auto mode always hits the
'semantic' fallback — this implements the advertised contract instead).

The model is a multinomial logit with INTEGER-scaled weights over
integer/boolean profile features. Integer logits keep the argmax and the
confidence ratio bit-identical across the Python kernel, Spark, and the
DuckDB oracle. At scale the whole thing is one codegen'd projection: no
UDF, no shuffle, no broadcast state beyond literal weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ragstudio_spark.operators import profiler

# must stay in sync with kernel.profile.ml_strategy_scores — the parity
# test (tests/test_operator_kernel_parity.py) pins them to each other
ML_CLASSES = ("semantic", "sentence", "token")


def ml_scores(text: Column) -> dict[str, Column]:
    """Integer logit columns per class (same formulas as the kernel)."""
    t = F.floor(F.length(text) / 4).cast("bigint")
    b_short = F.when(t < 500, 1).otherwise(0)
    b_mid = F.when((t >= 500) & (t < 2000), 1).otherwise(0)
    b_long = F.when(t >= 2000, 1).otherwise(0)
    h = F.when(profiler.has_headings(text), 1).otherwise(0)
    tb = F.when(profiler.has_tables(text), 1).otherwise(0)
    ls = F.when(profiler.has_lists(text), 1).otherwise(0)
    d = profiler.hierarchy_depth(text).cast("bigint")
    return {
        "semantic": (3 * h + 2 * tb + 2 * d + 4 * b_long + ls).cast("bigint"),
        "sentence": (2 + 3 * b_mid + b_long).cast("bigint"),
        "token": (1 + 4 * b_short).cast("bigint"),
    }


def with_ml_strategy(df: DataFrame, text_col: str = "text",
                     prefix: str = "ml_") -> DataFrame:
    """Attach ``{prefix}strategy`` / ``{prefix}confidence`` (+ the integer
    logits ``{prefix}score_<class>``). Ties break in ML_CLASSES order."""
    scores = ml_scores(F.col(text_col))
    for cls in ML_CLASSES:
        df = df.withColumn(f"{prefix}score_{cls}", scores[cls])
    s = {cls: F.col(f"{prefix}score_{cls}") for cls in ML_CLASSES}
    pred = (
        F.when((s["semantic"] >= s["sentence"]) & (s["semantic"] >= s["token"]),
               F.lit("semantic"))
        .when(s["sentence"] >= s["token"], F.lit("sentence"))
        .otherwise(F.lit("token"))
    )
    best = F.greatest(*s.values())
    total = sum(list(s.values())[1:], list(s.values())[0])
    conf = F.when(total > 0, best.cast("double") / total).otherwise(F.lit(0.0))
    return (
        df.withColumn(f"{prefix}strategy", pred)
        .withColumn(f"{prefix}confidence", conf)
    )
