"""SFT pair mining — turning conversation transcripts into supervised
fine-tuning examples, the step between this engine's transcript tables
and a trainer's (prompt, response) dataset.

``sft_pairs`` extracts consecutive user→assistant turn pairs per
conversation: the prompt is the user turn, the response is the
assistant turn that DIRECTLY follows it (``turn_idx + 1`` — a tool turn
or a gap between them disqualifies the pair, because the assistant text
would then be answering tool output the example doesn't carry).

Scale shape: one per-conversation window (lead over turn order) — the
same partitioning the pipeline already buckets by, so on a conv_id-
bucketed table this is shuffle-free. No global windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sft_pairs(df: DataFrame, conv_col: str = "conv_id",
              idx_col: str = "turn_idx", role_col: str = "role",
              text_col: str = "text", user_role: str = "user",
              assistant_role: str = "assistant") -> DataFrame:
    """(conv_id, turn_idx, prompt, response, prompt_chars,
    response_chars) — one row per mined pair; ``turn_idx`` is the USER
    turn's index."""
    w = Window.partitionBy(conv_col).orderBy(F.asc(idx_col))
    cand = df.select(
        F.col(conv_col), F.col(idx_col), F.col(role_col),
        F.col(text_col).alias("prompt"),
        F.lead(role_col).over(w).alias("_nrole"),
        F.lead(text_col).over(w).alias("response"),
        F.lead(idx_col).over(w).alias("_nidx"),
    )
    return (cand.filter((F.col(role_col) == user_role)
                        & (F.col("_nrole") == assistant_role)
                        & (F.col("_nidx") == F.col(idx_col) + 1))
            .select(conv_col, idx_col, "prompt", "response",
                    F.coalesce(F.length("prompt"), F.lit(0))
                    .cast("bigint").alias("prompt_chars"),
                    F.coalesce(F.length("response"), F.lit(0))
                    .cast("bigint").alias("response_chars")))


def sft_multiturn(df: DataFrame, conv_col: str = "conv_id",
                  idx_col: str = "turn_idx", role_col: str = "role",
                  text_col: str = "text", user_role: str = "user",
                  assistant_role: str = "assistant",
                  max_context_turns: int = 8) -> DataFrame:
    """Multi-turn SFT examples: for each assistant turn directly preceded
    by a user turn, the prompt is the last ``max_context_turns`` turns
    rendered as ``role: text`` lines (conversation-history format), the
    response is the assistant turn. Returns (conv_id, turn_idx [of the
    assistant turn], prompt, response, n_context_turns).

    The context window is a bounded per-conversation ROWS frame — never
    the whole conversation (a 2000-turn transcript must not quadratically
    re-ship its history per example; the cap is the standard truncated-
    history training shape). The collected context is explicitly
    array_sorted by turn index: frame iteration order is an
    implementation detail neither engine contracts.

    Expression shape (review-found, plan-verified): the adjacency/role
    predicates use lag() over the plain window, NOT the context array —
    filtering through array expressions would inline the struct sort into
    every reference (the CLAUDE.md Catalyst trap, measured at 3 extra
    sorts per input row); array_sort now appears exactly once, in the
    prompt projection of surviving rows, and n_context_turns reads the
    unsorted attribute."""
    w_full = Window.partitionBy(conv_col).orderBy(F.asc(idx_col))
    w_frame = w_full.rowsBetween(-max_context_turns, -1)
    raw_ctx = F.collect_list(
        F.struct(F.col(idx_col).alias("i"), F.col(role_col).alias("r"),
                 F.col(text_col).alias("t"))).over(w_frame)
    cand = df.select(
        F.col(conv_col), F.col(idx_col), F.col(role_col),
        F.col(text_col).alias("response"),
        F.lag(role_col).over(w_full).alias("_prole"),
        F.lag(idx_col).over(w_full).alias("_pidx"),
        raw_ctx.alias("_ctx"))
    return (cand.filter((F.col(role_col) == assistant_role)
                        & (F.col("_prole") == user_role)
                        & (F.col("_pidx") == F.col(idx_col) - 1))
            .select(
                conv_col, idx_col,
                F.array_join(
                    F.transform(F.array_sort(F.col("_ctx")),
                                lambda s: F.concat(
                                    F.coalesce(s["r"], F.lit("")),
                                    F.lit(": "),
                                    F.coalesce(s["t"], F.lit("")))),
                    "\n").alias("prompt"),
                "response",
                F.size("_ctx").cast("int").alias("n_context_turns")))


def preference_pairs(df: DataFrame, key_col: str = "query_id",
                     id_col: str = "feedback_id",
                     rating_col: str = "numeric_rating",
                     min_gap: float = 1.0) -> DataFrame:
    """Preference-pair mining (the DPO/RLHF data-prep step): per key,
    pair the highest-rated candidate (chosen) with the lowest-rated
    (rejected), emitted only when the rating gap reaches ``min_gap`` —
    returns (key, chosen_id, rejected_id, chosen_rating,
    rejected_rating) with DECIMAL(18,2) ratings (exact arithmetic; the
    gap comparison must not sit on a float boundary).

    Determinism: ties at the max/min rating resolve to the LOWEST id,
    via the portable max-then-min-among-ties shape (arg_max struct
    orderings differ across engines). Rows with NULL ratings never
    participate. Shape: one groupBy for the extremes, two tie-resolving
    joins on the key — all key-partitioned, no windows over the corpus."""
    dec = "decimal(18,2)"
    rated = (df.filter(F.col(rating_col).isNotNull())
             .select(F.col(key_col), F.col(id_col),
                     F.col(rating_col).cast(dec).alias("_r")))
    ext = rated.groupBy(key_col).agg(F.max("_r").alias("_max_r"),
                                     F.min("_r").alias("_min_r"))
    chosen = (rated.join(ext, on=key_col)
              .filter(F.col("_r") == F.col("_max_r"))
              .groupBy(key_col)
              .agg(F.min(id_col).alias("chosen_id"),
                   F.max("_r").alias("chosen_rating")))
    rejected = (rated.join(ext, on=key_col)
                .filter(F.col("_r") == F.col("_min_r"))
                .groupBy(key_col)
                .agg(F.min(id_col).alias("rejected_id"),
                     F.max("_r").alias("rejected_rating")))
    # gap test on exact decimals; EMITTED ratings cast to double (the
    # decimal values are exact, and engines render decimals differently)
    return (chosen.join(rejected, on=key_col)
            .filter((F.col("chosen_rating") - F.col("rejected_rating")
                     >= F.lit(min_gap).cast(dec))
                    & (F.col("chosen_id") != F.col("rejected_id")))
            .select(key_col, "chosen_id", "rejected_id",
                    F.col("chosen_rating").cast("double")
                    .alias("chosen_rating"),
                    F.col("rejected_rating").cast("double")
                    .alias("rejected_rating")))


def sft_pair_stats(pairs: DataFrame,
                   conv_col: str = "conv_id") -> DataFrame:
    """One-row dataset manifest: pair count, conversations covered,
    exact char totals (integer — oracle discipline)."""
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.countDistinct(conv_col).cast("bigint").alias("n_conversations"),
        # coalesce: F.sum over zero rows is NULL, and the manifest
        # contract is exact bigint totals, including for an empty mine
        F.coalesce(F.sum("prompt_chars"), F.lit(0)).cast("bigint")
        .alias("total_prompt_chars"),
        F.coalesce(F.sum("response_chars"), F.lit(0)).cast("bigint")
        .alias("total_response_chars"),
    )
