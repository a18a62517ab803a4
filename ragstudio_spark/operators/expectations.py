"""Declarative data-quality expectations — the contract gate a warehouse
runs on every ingest (dbt tests / Great Expectations, public practice).

The reference validates inputs imperatively per file
(/root/reference/src/core/cli/utils/validation.py, quality_check.py);
at table scale the same idea is a RULESET evaluated in ONE aggregation
pass: every rule compiles to a conditional-count column expression, so a
50-rule suite costs one scan regardless of rule count — never one job
per rule.

Rules (each a dict, validated eagerly):
* ``{"type": "not_null", "col": c}``                 — NULLs violate
* ``{"type": "unique", "cols": [c, ...]}``           — duplicate keys
  violate (counted as rows beyond the first per key); rows with a NULL
  anywhere in the key are EXCLUDED from the check — dbt's unique test
  and Great Expectations both skip nulls (pair with not_null to forbid
  them), and ``n_rows`` for a unique rule counts only the checked rows
* ``{"type": "accepted_values", "col": c, "values": [...]}`` — rows
  outside the set violate (NULL is a violation: it is not a value)
* ``{"type": "range", "col": c, "lo": x, "hi": y}``  — rows outside
  [lo, hi] violate (NULL violates: unknown is not in range)
* ``{"type": "regex", "col": c, "pattern": p}``      — non-matching
  non-NULL rows violate (pair with not_null to forbid NULL too);
  patterns are compiled eagerly with JAVA regex semantics (the engine
  that executes rlike — Python's re accepts/rejects a different
  dialect)

Output: one row per rule — (rule_id, rule_type, target, n_violations,
n_rows, passed) — exact integers. ``unique`` needs its own grouped
aggregate (a per-key count), so the report is one scan + one grouped
agg per DISTINCT unique-rule key set, unioned JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TYPES = ("not_null", "unique", "accepted_values", "range", "regex")


def _validate(rules: list[dict], spark) -> None:
    if not rules:
        raise ValueError("rules must be non-empty")
    for i, r in enumerate(rules):
        t = r.get("type")
        if t not in _TYPES:
            raise ValueError(f"rule {i}: unknown type {t!r} (have {_TYPES})")
        if t == "unique":
            if not r.get("cols"):
                raise ValueError(f"rule {i}: unique needs non-empty cols")
        elif not r.get("col"):
            raise ValueError(f"rule {i}: {t} needs col")
        if t == "accepted_values" and not r.get("values"):
            raise ValueError(f"rule {i}: accepted_values needs values")
        if t == "range" and ("lo" not in r or "hi" not in r):
            raise ValueError(f"rule {i}: range needs lo and hi")
        if t == "regex":
            if "pattern" not in r:
                raise ValueError(f"rule {i}: regex needs pattern")
            # compile with the JAVA engine that will execute rlike —
            # Python's re accepts a different dialect in both directions
            # ((?P<name>…) vs \\p{Lower}; review-found), so a re.compile
            # check rejects valid rules and passes invalid ones
            try:
                spark._jvm.java.util.regex.Pattern.compile(r["pattern"])
            except Exception as exc:
                raise ValueError(
                    f"rule {i}: invalid Java regex {r['pattern']!r}: "
                    f"{exc}") from None


def _violation_col(r: dict):
    t = r["type"]
    if t == "not_null":
        return F.col(r["col"]).isNull()
    if t == "accepted_values":
        return ~F.col(r["col"]).isin(list(r["values"])) | \
            F.col(r["col"]).isNull()
    if t == "range":
        c = F.col(r["col"])
        return c.isNull() | (c < F.lit(r["lo"])) | (c > F.lit(r["hi"]))
    if t == "regex":
        c = F.col(r["col"])
        return c.isNotNull() & ~c.rlike(r["pattern"])
    raise AssertionError(t)


def _target(r: dict) -> str:
    return ",".join(r["cols"]) if r["type"] == "unique" else r["col"]


def expectations_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate the ruleset: one scan for all row-local rules (every
    rule is a conditional count in a single aggregate) plus one grouped
    aggregate per distinct unique-rule key set. Returns one row per
    rule in input order."""
    _validate(rules, df.sparkSession)
    row_local = [(i, r) for i, r in enumerate(rules) if r["type"] != "unique"]
    uniques = [(i, r) for i, r in enumerate(rules) if r["type"] == "unique"]
    spark = df.sparkSession
    parts = []
    if row_local:
        aggs = [F.count("*").cast("bigint").alias("_n")]
        for i, r in row_local:
            aggs.append(F.sum(_violation_col(r).cast("bigint"))
                        .cast("bigint").alias(f"_v{i}"))
        one = df.agg(*aggs)
        structs = F.array(*[
            F.struct(F.lit(i).alias("rule_id"),
                     F.lit(r["type"]).alias("rule_type"),
                     F.lit(_target(r)).alias("target"),
                     F.coalesce(F.col(f"_v{i}"), F.lit(0))
                     .alias("n_violations"))
            for i, r in row_local])
        parts.append(one.select(F.explode(structs).alias("_s"), "_n")
                     .select("_s.rule_id", "_s.rule_type", "_s.target",
                             "_s.n_violations", F.col("_n").alias("n_rows")))
    for i, r in uniques:
        keys = list(r["cols"])
        # dbt/GE semantics: NULL-keyed rows are exempt from uniqueness
        # (a collapsed all-NULL group would otherwise report spurious
        # violations; review-found) — forbid NULLs with not_null
        non_null = df
        for k in keys:
            non_null = non_null.filter(F.col(k).isNotNull())
        per_key = non_null.groupBy(*keys).agg(F.count("*").alias("_c"))
        agg = per_key.agg(
            F.coalesce(F.sum(F.expr("_c - 1")), F.lit(0)).cast("bigint")
            .alias("n_violations"),
            F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint")
            .alias("n_rows"))
        parts.append(agg.select(
            F.lit(i).cast("int").alias("rule_id"),
            F.lit("unique").alias("rule_type"),
            F.lit(_target(r)).alias("target"),
            "n_violations", "n_rows"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (out.withColumn("passed", F.col("n_violations") == 0)
            .orderBy("rule_id"))
