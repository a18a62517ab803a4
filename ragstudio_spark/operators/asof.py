"""As-of (temporal nearest-prior) join — the event-stream primitive.

For each left row, attach the LATEST right row with ``right.ts <=
left.ts`` within the same key — "what was the most recent view before
this click", "which model snapshot was live when this request arrived".
The engine's cache tier already does a specialized as-of read
(pipeline/cache.py resolve); this is the general two-table operator.

Scale shape — the part that matters at 10^12 events: the naive
formulation is a range join (``l.key = r.key AND r.ts <= l.ts`` +
argmax), which Spark executes as a per-key cross product — quadratic in
events-per-key. This operator instead UNIONS the two sides into one
tagged stream and takes one window ``last(right_payload, ignorenulls)``
per key: ONE shuffle on the key, one sort by (ts, side, tiebreak) — the
same cost as a sessionization pass, linear in events-per-key. DuckDB
ships the same algorithm as native ``ASOF JOIN`` (the oracle twin).

Determinism: at equal timestamps the right row sorts BEFORE the left
(side 0 < 1 ⇒ inclusive "<=" semantics), and right-vs-right ties order
by ``right_tiebreak`` ascending so the LARGEST tiebreak value wins —
partition- and arrival-order-independent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame,
              right_cols: Sequence[str],
              ts_col: str = "ts", by: Sequence[str] = ("user_id",),
              right_tiebreak: str | None = None,
              tolerance_s: float | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join: every left row, plus ``right_cols`` (suffixed)
    and ``ts_col + suffix`` from the matched right row — NULLs when no
    right row precedes it (or none within ``tolerance_s`` seconds).

    ``right_tiebreak`` names a right column ordering equal-timestamp
    right rows (largest wins); required if such ties are possible.
    ``by`` keys must be bounded-cardinality groupable keys (the window
    runs per key); heavy single keys need pre-salting like any other
    per-key window."""
    if not right_cols:
        raise ValueError("right_cols must be non-empty")
    if ts_col in right_cols:
        raise ValueError(
            f"{ts_col!r} is emitted automatically as {ts_col}{suffix}; "
            "drop it from right_cols")
    overlap = set(right_cols) & set(left.columns)
    bys = list(by)
    payload = [*right_cols, ts_col]
    if right_tiebreak is not None and right_tiebreak not in payload:
        payload.append(right_tiebreak)
    # equi-join NULL semantics (the DuckDB-ASOF contract the oracle pins):
    # a right row with a NULL key or NULL ts can never match anything —
    # unfiltered, NULLS-FIRST ordering would make a NULL-ts row act as
    # ts = -infinity and match every predecessor-less left row, and
    # partitionBy groups NULL keys together (both review-found, both
    # invisible to the NULL-free oracle fixture). NULL-ts/NULL-key LEFT
    # rows sort before every surviving right row, so they emit no match.
    r_clean = right.filter(F.col(ts_col).isNotNull())
    for c in bys:
        r_clean = r_clean.filter(F.col(c).isNotNull())
    # ship by/ts ONCE: the struct carries only the remaining left
    # columns; by/ts re-emit from the top-level union columns
    l_extra = [c for c in left.columns if c not in bys and c != ts_col]
    r_struct = F.struct(*[F.col(c) for c in payload])
    l_tag = left.select(
        *bys, F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"),
        *([F.struct(*[F.col(c) for c in l_extra]).alias("_l")]
          if l_extra else []))
    r_tag = r_clean.select(
        *bys, F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"),
        r_struct.alias("_r"))
    u = l_tag.withColumn("_r", F.lit(None).cast(
        r_tag.schema["_r"].dataType))
    r_all = r_tag
    if l_extra:
        r_all = r_all.withColumn("_l", F.lit(None).cast(
            l_tag.schema["_l"].dataType))
    u = u.unionByName(r_all.select(*u.columns))
    order = [F.asc("_ts"), F.asc("_side")]
    if right_tiebreak is not None:
        order.append(F.asc(F.col("_r").getField(right_tiebreak)))
    w = (Window.partitionBy(*[F.col(c) for c in bys]).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        # cast through TIMESTAMP: unix_micros rejects TIMESTAMP_NTZ
        # (identity under the engine's pinned-UTC sessions)
        in_tol = ((F.unix_micros(F.col("_ts").cast("timestamp"))
                   - F.unix_micros(F.col("_m").getField(ts_col)
                                   .cast("timestamp")))
                  <= int(tolerance_s * 1_000_000))
        out = out.withColumn("_m", F.when(in_tol, F.col("_m")))
    cols = []
    for c in left.columns:
        if c in bys:
            cols.append(F.col(c))
        elif c == ts_col:
            cols.append(F.col("_ts").alias(ts_col))
        else:
            cols.append(F.col("_l").getField(c).alias(c))
    cols += [F.col("_m").getField(c).alias(
        f"{c}{suffix}" if (c in overlap or c == ts_col) else c)
        for c in [*right_cols, ts_col]]
    return out.select(*cols)
