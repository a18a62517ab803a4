"""Targeted query benchmarks + plan capture for optimization work.

bench.py is FROZEN for measurement; this separate harness reproduces its
per-query methodology (same session config, same ``.count()`` action,
min-of-N) for a chosen subset of the battery so an optimization loop can
iterate in seconds instead of re-running the full suite. It can also dump
``.explain("formatted")`` output for the judge's plan evidence
(plans/r07/<query>_{before,after}.txt).

Usage:
  python bench_extra.py q1 q2 ...            # time queries (min-of-2)
  python bench_extra.py --plans-dir plans/r07 --suffix before q1 q2
                                             # also write explain output
  python bench_extra.py --repeat 3 q1        # min-of-3
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...

Prints one JSON line: {"queries": {name: sec}, "sf_dir": ..., "repeat": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="time with the noop sink (full materialization) "
                         "instead of bench.py's .count()")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ragstudio_spark import entry_queries
    from ragstudio_spark.session import get_spark

    spark = get_spark("ragstudio-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={"spark.sql.files.openCostInBytes": "0"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_queries.queries()

    timings: dict[str, float] = {}
    for name in args.names:
        if name not in qs:
            raise SystemExit(f"unknown query: {name}")
        df = qs[name](spark, sf_dir)
        if args.plans_dir:
            import contextlib
            import io

            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times = []
        for _ in range(args.repeat):
            # construction INSIDE the timer — bench.py's timed() does
            # qs[n](spark, sf_dir).count(), and some queries do eager
            # work (localCheckpoint/collect) at construction
            t0 = time.time()
            d = qs[name](spark, sf_dir)
            if args.noop:
                d.write.format("noop").mode("overwrite").save()
            else:
                d.count()
            times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(min(times), 3)
        print(f"# {name}: {timings[name]} (samples: "
              f"{[round(t, 3) for t in times]})", file=sys.stderr)

    print(json.dumps({"queries": timings, "sf_dir": sf_dir,
                      "repeat": args.repeat, "noop": bool(args.noop)}))
    spark.stop()


if __name__ == "__main__":
    main()
