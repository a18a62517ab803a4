"""Sessionization — gap-based session assignment over event streams.

First-class operator form of the `sessionize_events` query (SURVEY §2.8
window tier): an event belongs to a new session when it follows the
previous event of the same user by more than ``gap``. Classic two-window
shape, both windows partitioned by user (no global shuffle):

    lag(ts)   → new_session flag (one boundary per session)
    sum(flag) → cumulative session index per user

Session ids are deterministic: ``user_id#<n>`` with n from event-time
order (ties broken by event id), never from shuffle order. At scale both
windows ride one hash partition by user_id; skewed users are bounded by
their own event counts (a window, unlike collect_list, streams sorted
runs and spills).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(df: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Attach ``session_seq`` (1-based per user) and ``session_id``
    (user#seq) to every event row."""
    order = [F.col(ts_col).asc(), F.col(order_tiebreak).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNotNull()
        & (F.col(ts_col).cast("timestamp")
           > prev_ts.cast("timestamp") + F.expr(f"INTERVAL {gap_minutes} MINUTE")),
        1,
    ).otherwise(0)
    cum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn("_new", new_session).withColumn(
        "session_seq", (F.sum("_new").over(cum) + 1).cast("bigint")).drop("_new")
    return out.withColumn(
        "session_id",
        F.concat_ws("#", F.col(user_col), F.col("session_seq").cast("string")))


def session_stats(df: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  order_tiebreak: str = "event_id") -> DataFrame:
    """Per-session rollup: event count + span (first/last event time)."""
    s = sessionize(df, gap_minutes, user_col, ts_col, order_tiebreak)
    return (
        s.groupBy(user_col, "session_seq", "session_id")
        .agg(F.count("*").alias("n_events"),
             F.min(ts_col).alias("session_start"),
             F.max(ts_col).alias("session_end"))
    )


def funnel(df: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis: per user, the EARLIEST strictly-increasing
    completion of the step sequence (view → click → purchase …).

    Greedy-earliest is exact for existence: taking the minimal timestamp
    at each step maximizes the remaining options, so a user converts iff
    the greedy chain completes (the classic funnel semantics of the
    analytics engines). Per user the output carries ``step{i}_us`` epoch
    micros for each reached step (NULL once the chain breaks),
    ``n_steps`` reached, and ``converted``.

    Scale shape: one filtered min-aggregate per step, each joined back
    on the user key — k co-partitioned shuffles for a k-step funnel,
    never a per-user window over raw events and no cross join; the
    aggregates collapse map-side so the shuffled volume is one row per
    user per step.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    base = df.select(user_col, F.col(type_col).alias("_t"),
                     us(ts_col).alias("_us"))
    out = base.select(user_col).distinct()
    prev = None
    for i, step in enumerate(steps):
        ev = base.filter(F.col("_t") == step)
        if prev is not None:
            ev = (ev.join(out.select(user_col, F.col(prev).alias("_p")),
                          user_col)
                  .filter(F.col("_us") > F.col("_p")))
        col = f"step{i + 1}_us"
        mins = ev.groupBy(user_col).agg(F.min("_us").alias(col))
        out = out.join(mins, user_col, "left")
        prev = col
    reached = sum(
        F.when(F.col(f"step{i + 1}_us").isNotNull(), 1).otherwise(0)
        for i in range(len(steps)))
    return (out.withColumn("n_steps", reached.cast("int"))
            .withColumn("converted",
                        F.col(f"step{len(steps)}_us").isNotNull())
            .orderBy(user_col))
