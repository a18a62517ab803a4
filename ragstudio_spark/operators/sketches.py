"""Cardinality sketches: a deterministic, engine-portable HyperLogLog.

The 100-TB problem this solves: ``COUNT(DISTINCT x)`` over a trillion-row
corpus is a full shuffle of every distinct value; an HLL register table is
a fixed ``m``-row (per group) aggregate whose per-partition state is
``m`` bytes and whose combiner is ``max`` — map-side combinable, stream-
mergeable (register-wise max), and exact-deterministic given the hash.

Design constraints that differ from library HLLs (datasketches, Spark's
own ``approx_count_distinct``):

* **Determinism across engines.** The hash is md5 (identical lowercase
  hex in Spark and DuckDB), bucket = first ``b_hex`` hex chars, and
  rho = leading-zero-bits of the next 7 hex chars (28 bits) + 1, computed
  with only substr/regexp/CASE — every intermediate is integer or string,
  so the register table is bit-identical in both engines (oracle-checkable),
  unlike library sketches whose hashes and tie handling are private.
* **Integer estimator core.** The harmonic-mean denominator is computed as
  the exact bigint ``S = sum(2^(29 - rho)) + n_empty * 2^29`` (max rho is
  29, so every term is integral; S <= m * 2^29 < 2^53, exactly
  representable as a double). The only float step is one pinned-literal
  division ``floor(ALPHA_NUM / S)`` — a single correctly-rounded IEEE op,
  identical in both engines. No float accumulation ever crosses engines.
* **Raw estimator only.** Flajolet's small-range linear-counting branch
  needs ``ln`` (libm, not guaranteed bit-identical across engines), so the
  operator emits ``n_zero_registers`` alongside the raw estimate and leaves
  the correction to the consumer (the accuracy unit applies it in Python).

Reference anchor: the engine's dedup/analytics tier (SURVEY §2 #59,
metrics tier) counts distincts exactly; this is the sketch path a
100-TB deployment swaps in. Public-knowledge algorithm:
Flajolet–Fuss–Gandouet–Meunier, "HyperLogLog" (AofA 2007).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: bits of the rho tail (7 hex chars); max rho = _RHO_BITS + 1.
_RHO_BITS = 28

#: leading-zero-bit count of the first non-zero hex digit.
_LZ4 = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}


def lz4_case_sql(col: str = "_f") -> str:
    """CASE expression mapping a non-zero hex digit column to the
    leading-zero-bit count of its 4-bit value — shared by the Spark
    registers and the DuckDB twin (single source, review-found)."""
    return ("CASE " + " ".join(
        f"WHEN {col} = '{d}' THEN {z}" for d, z in _LZ4.items())
        + " ELSE 0 END")


def _alpha(m: int) -> float:
    """Flajolet's alpha_m bias constant (m >= 128 branch)."""
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(df: DataFrame, value_col: str,
                  group_cols: tuple[str, ...] = (),
                  b_hex: int = 2) -> DataFrame:
    """Register table: one row per (group, bucket) PRESENT in the data,
    with ``rho = max`` over hashed values. Missing buckets mean register
    value 0 (the estimator accounts for them). The aggregate is a plain
    groupBy-max: map-side combinable, and two register tables over
    disjoint (or overlapping) data merge by ``max`` — union this output
    across shards/streams and re-aggregate to sketch their union.

    bucket = first ``b_hex`` hex chars of md5 (string key — the register
    id); rho = 1 + leading-zero-bits of the next 7 hex chars, i.e. the
    position of the first 1-bit in a 28-bit tail, 29 if the tail is all
    zeros. Pure substr/regexp/CASE — portable to the DuckDB twin. Each
    intermediate (hash, tail, zero-run length, first non-zero digit) is
    bound to a column attribute in its own select before reuse — an
    in-expression md5 referenced by bucket + tail + CASE arms would be
    recomputed per reference (the CollapseProject inlining trap)."""
    if b_hex not in (1, 2, 3):
        raise ValueError("b_hex must be 1, 2, or 3")
    lz4 = lz4_case_sql("_f")
    gb = list(group_cols)
    return (df
            .select(*gb, F.expr(f"md5(CAST({value_col} AS STRING))")
                    .alias("_h"))
            .filter(F.col("_h").isNotNull())
            .select(*gb, F.expr(f"substr(_h, 1, {b_hex})").alias("bucket"),
                    F.expr(f"substr(_h, {b_hex + 1}, 7)").alias("_t"))
            .select(*gb, "bucket", "_t",
                    F.expr("length(regexp_extract(_t, '^0*', 0))")
                    .alias("_nz"))
            .select(*gb, "bucket", "_nz",
                    F.expr("substr(_t, _nz + 1, 1)").alias("_f"))
            .select(*gb, "bucket",
                    F.expr(f"CAST(IF(_nz = 7, {_RHO_BITS + 1}, "
                           f"4 * _nz + {lz4} + 1) AS INT)").alias("rho"))
            .groupBy(*gb, "bucket")
            .agg(F.max("rho").alias("rho")))


def _merge_tables(tables, value_col: str, agg_fn) -> DataFrame:
    """Union tables and re-aggregate ``value_col`` with ``agg_fn`` over
    every other column — the shared shape of both sketch merges."""
    merged = tables[0]
    for t in tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c != value_col]
    return merged.groupBy(*keys).agg(
        agg_fn(value_col).alias(value_col))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union-merge register tables (register-wise max) — the sketch of
    the union of the underlying datasets."""
    return _merge_tables(register_tables, "rho", F.max)


def hll_estimate(df: DataFrame, value_col: str,
                 group_cols: tuple[str, ...] = (),
                 b_hex: int = 2) -> DataFrame:
    """Per-group raw HLL cardinality estimate.

    Output: (group..., n_buckets, n_zero_registers, est_hll). The
    denominator S is an exact bigint (shiftleft, never power()); the
    estimate is one pinned-literal double division + floor. Consumers
    needing Flajolet's small-range correction apply
    ``m * ln(m / n_zero_registers)`` when est <= 2.5 * m and zeros > 0.

    The group universe is ``df``'s group keys, not the hashed rows': a
    group whose values are all NULL still reports, with
    n_zero_registers = m and est_hll = 0 — matching the
    ``COUNT(DISTINCT x) GROUP BY g`` aggregate this swaps in for
    (the raw estimator would read alpha*m on an empty register set —
    review-found)."""
    gb = list(group_cols)
    regs = hll_registers(df, value_col, group_cols, b_hex)
    universe = df.select(*gb).distinct() if gb else None
    return hll_estimate_from_registers(regs, group_cols, b_hex, universe)


def hll_estimate_from_registers(regs: DataFrame,
                                group_cols: tuple[str, ...] = (),
                                b_hex: int = 2,
                                universe: DataFrame | None = None
                                ) -> DataFrame:
    """The estimator half of ``hll_estimate``, over an existing register
    table (hll_registers output, or a merged/streamed one). ``universe``
    optionally supplies the group-key set the output must cover (keys
    null-safe-joined; absent groups report est 0) — a register table
    alone cannot know about groups whose values never hashed.

    The log carries no b_hex, so a mismatched reader (e.g. a b_hex=1
    ingest read with the default 2) cannot be caught at call time;
    bucket width IS observable per group, so a width inconsistent with
    ``b_hex`` yields est_hll NULL — loudly wrong instead of a silently
    plausible under/over-estimate (review-found)."""
    m = 16 ** b_hex
    scale = _RHO_BITS + 1
    alpha_num = _alpha(m) * m * m * float(1 << scale)
    gb = list(group_cols)
    per_group = (regs.groupBy(*gb).agg(
        F.count("*").cast("bigint").alias("_n_present"),
        F.min(F.length("bucket")).alias("_bw_min"),
        F.max(F.length("bucket")).alias("_bw_max"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - rho)"))
        .cast("bigint").alias("_s_present")))
    if universe is not None and gb:
        cond = None
        for c in gb:
            eq = universe[c].eqNullSafe(per_group[c])
            cond = eq if cond is None else cond & eq
        per_group = (universe.join(per_group, on=cond, how="left")
                     .select(*[universe[c] for c in gb],
                             "_n_present", "_bw_min", "_bw_max",
                             "_s_present"))
    n_present = F.coalesce("_n_present", F.lit(0)).cast("bigint")
    s_total = (F.coalesce("_s_present", F.lit(0)).cast("bigint")
               + (F.lit(m) - n_present)
               * F.lit(1 << scale).cast("bigint"))
    width_ok = ((F.col("_np") == 0)
                | ((F.col("_bw_min") == b_hex)
                   & (F.col("_bw_max") == b_hex)
                   & (F.col("_np") <= m)))
    return (per_group
            .withColumn("_np", n_present)
            .withColumn("_s", s_total)
            .select(*gb,
                    F.lit(m).cast("bigint").alias("n_buckets"),
                    (F.lit(m) - F.col("_np")).cast("bigint")
                    .alias("n_zero_registers"),
                    F.when(~width_ok, F.lit(None))
                    .when(F.col("_np") > 0,
                          F.floor(F.lit(alpha_num)
                                  / F.col("_s").cast("double")))
                    .otherwise(F.lit(0))
                    .cast("bigint").alias("est_hll")))


# --- count-min sketch --------------------------------------------------------

def cms_build(df: DataFrame, value_col: str,
              group_cols: tuple[str, ...] = (),
              width: int = 1024, depth: int = 3) -> DataFrame:
    """Count-min sketch counters (Cormode–Muthukrishnan, public
    algorithm): ``depth`` rows of ``width`` counters; value v increments
    counter (i, h_i(v)) for each row i. Frequency estimates (cms_query)
    are upper bounds — exact for collision-free values, inflated by
    collisions otherwise, never under.

    The 100-TB story mirrors hll_registers: exact n-gram/token frequency
    over a trillion rows shuffles the full vocabulary; the sketch is a
    bounded ``depth × width``-row aggregate (per group) whose combiner
    is ``+`` — map-side combinable, mergeable by summing counter tables.
    Determinism: h_i = disjoint 32-bit segments of ONE md5, via the same
    engine-portable instr fold as the bloom tier
    (dedupe._hex_positions) — bit-identical counters in both engines.

    Output: (group…, row_idx, bucket, cnt) for NONZERO counters only
    (a trillion-row build leaves most of a wide sketch dense, but
    sparse groups stay sparse — absent counters read 0)."""
    from ragstudio_spark.operators.dedupe import _hex_positions

    if width <= 0:
        raise ValueError("width must be positive")
    gb = list(group_cols)
    hashed = (df.select(*gb,
                        F.expr(f"md5(CAST({value_col} AS STRING))")
                        .alias("_h"))
              .filter(F.col("_h").isNotNull()))
    positions = _hex_positions("_h", width, depth)
    return (hashed
            .select(*gb, F.posexplode(F.array(
                *[F.expr(p).cast("bigint") for p in positions]))
                .alias("row_idx", "bucket"))
            .groupBy(*gb, "row_idx", "bucket")
            .agg(F.count("*").cast("bigint").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum-merge counter tables — the sketch of the concatenated data."""
    return _merge_tables(
        sketches, "cnt", lambda c: F.sum(c).cast("bigint"))


def cms_query(cms: DataFrame, queries: DataFrame, value_col: str,
              width: int = 1024, depth: int = 3) -> DataFrame:
    """Point-frequency estimates for ``queries``' values against a
    cms_build table (same width/depth): est = min over the depth
    counters, 0 when any counter row is absent. One positions explode
    on the (small) query side + one key join against the counter table
    — the corpus never rescans. Takes an UNGROUPED counter table; for a
    grouped build, filter to one group (or add the group key to the
    join) first — silently min-ing across groups would under-estimate.
    width/depth MUST match the build call (the counter table carries
    neither): a mismatch computes different buckets and can silently
    under-estimate, which no guard here can see."""
    from ragstudio_spark.operators.dedupe import _hex_positions

    if width <= 0:
        raise ValueError("width must be positive")
    extra = set(cms.columns) - {"row_idx", "bucket", "cnt"}
    if extra:
        raise ValueError(
            f"cms carries group columns {sorted(extra)}; filter to one "
            "group before querying")
    hashed = (queries.select(F.col(value_col).alias("value"))
              .distinct()
              .withColumn("_h", F.expr("md5(CAST(value AS STRING))")))
    positions = _hex_positions("_h", width, depth)
    qpos = hashed.select(
        "value", F.posexplode(F.array(
            *[F.expr(p).cast("bigint") for p in positions]))
        .alias("row_idx", "bucket"))
    joined = qpos.join(cms, on=["row_idx", "bucket"], how="left")
    return (joined.groupBy("value")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint")
                 .alias("est_count")))
