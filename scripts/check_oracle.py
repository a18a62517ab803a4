"""Local replica of the driver's correctness gate: run each entry query on
Spark and its oracle on DuckDB at sf0.01, compare row count + column names +
order-insensitive values. Usage: python scripts/check_oracle.py [names...]"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from ragstudio_spark import entry_queries
from ragstudio_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    global SF_DIR
    args = sys.argv[1:]
    names = []
    i = 0
    while i < len(args):  # --sf 0.1 or --sf=0.1 → run at another SF
        a = args[i]
        if a == "--sf":
            if i + 1 >= len(args):
                sys.exit("usage: check_oracle.py [--sf 0.1] [names...]")
            SF_DIR = f"/root/testdata/sf{args[i + 1]}"
            i += 2
        elif a.startswith("--sf="):
            SF_DIR = f"/root/testdata/sf{a.split('=', 1)[1]}"
            i += 1
        elif a.startswith("-"):
            sys.exit(f"unknown flag {a!r}; usage: check_oracle.py [--sf 0.1] [names...]")
        else:
            names.append(a)
            i += 1
    only = set(names)
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_queries.queries()
    oracles = entry_queries.oracle_sql()
    unknown = only - set(qs)
    if unknown:  # a typo must not yield a vacuous green gate
        sys.exit(f"unknown query names: {sorted(unknown)}")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:400]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck] {name}: {str(e)[:400]}")
            continue
        if sorted(got.columns) != sorted(exp.columns):
            failures.append((name, f"columns {sorted(got.columns)} vs {sorted(exp.columns)}"))
            print(f"[FAIL-cols] {name}: {sorted(got.columns)} vs {sorted(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append((name, f"rows {len(got)} vs {len(exp)}"))
            print(f"[FAIL-rows] {name}: {len(got)} vs {len(exp)}")
            continue
        g, e = normalize(got), normalize(exp)
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"[OK] {name}: {len(got)} rows")
        except AssertionError as err:
            failures.append((name, "value mismatch"))
            print(f"[FAIL-vals] {name}: {str(err)[:500]}")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[n for n, _ in failures]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
