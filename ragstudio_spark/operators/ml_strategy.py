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

#: feature order of the classifier (bias first; the trainer's weight
#: vectors use the same keys — operators/ml_trainer.py)
ML_FEATURES = ("bias", "b_short", "b_mid", "b_long",
               "has_headings", "has_tables", "has_lists", "depth")

#: the published integer weights (reference auto-mode contract — see
#: module docstring); ml_scores is generated from this table so the
#: trainer's output is directly comparable
ML_WEIGHTS: dict[str, dict[str, int]] = {
    "semantic": {"b_long": 4, "has_headings": 3, "has_tables": 2,
                 "has_lists": 1, "depth": 2},
    "sentence": {"bias": 2, "b_mid": 3, "b_long": 1},
    "token": {"bias": 1, "b_short": 4},
}


def ml_features(text: Column) -> dict[str, Column]:
    """Integer feature columns (the structural-feature subset of the
    reference's extract_structural_features,
    /root/reference/src/workflows/ml/feature_engineering.py:51-109 —
    token-length buckets, heading/table/list flags, hierarchy depth; the
    embedding block needs a sentence-transformers model and is excluded
    per SURVEY §7.2)."""
    t = F.floor(F.length(text) / 4).cast("bigint")
    return {
        "bias": F.lit(1).cast("bigint"),
        "b_short": F.when(t < 500, 1).otherwise(0).cast("bigint"),
        "b_mid": F.when((t >= 500) & (t < 2000), 1).otherwise(0).cast("bigint"),
        "b_long": F.when(t >= 2000, 1).otherwise(0).cast("bigint"),
        "has_headings": F.when(profiler.has_headings(text), 1)
        .otherwise(0).cast("bigint"),
        "has_tables": F.when(profiler.has_tables(text), 1)
        .otherwise(0).cast("bigint"),
        "has_lists": F.when(profiler.has_lists(text), 1)
        .otherwise(0).cast("bigint"),
        "depth": profiler.hierarchy_depth(text).cast("bigint"),
    }


def scores_from_weights(text: Column,
                        weights: dict[str, dict[str, int]]) -> dict[str, Column]:
    """Integer logits w·x for an arbitrary weight table (skips zero terms
    so the published-weight plan is identical to the hand-written one)."""
    feats = ml_features(text)
    out: dict[str, Column] = {}
    for cls, w in weights.items():
        expr = None
        for name, wv in w.items():
            if not wv:
                continue
            term = feats[name] if wv == 1 else wv * feats[name]
            expr = term if expr is None else expr + term
        out[cls] = (expr if expr is not None else F.lit(0)).cast("bigint")
    return out


def ml_scores(text: Column) -> dict[str, Column]:
    """Integer logit columns per class (same formulas as the kernel)."""
    return scores_from_weights(text, ML_WEIGHTS)


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
