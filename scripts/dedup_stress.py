"""Dedup-tier scale-up stress: the same operators at 1× and 10× corpus.

The sandbox tops out at sf0.1 (5,000 docs); this synthesizes a 10× corpus
by unioning 10 mutated copies (each copy appends a distinct token, so
copies are near- but not exact-dups — every base doc becomes a 10-member
near-dup cluster, the realistic shape of a crawl corpus). Measures wall
time at both sizes and reports the growth factor: a scale-safe candidate
generator grows ~linearly in docs + true pairs; anything super-linear
flags a join whose fan-out is not under control.

Output: markdown table (for BASELINE.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from ragstudio_spark.operators import dedupe
    from ragstudio_spark.session import get_spark

    spark = get_spark("dedup-stress", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def corpus(copies: int):
        parts = [
            base.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytoken{i}")).alias("text"))
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.repartition(64).cache()

    ops = {
        "exact_dup": lambda d: dedupe.exact_duplicates(d).count(),
        "minhash_8h2b": lambda d: dedupe.minhash_lsh_pairs(d).count(),
        "minhash_16h4b": lambda d: dedupe.minhash_lsh_pairs(
            d, n_hashes=16, n_bands=4).count(),
        "simhash64_pairs": lambda d: dedupe.simhash64_near_pairs(d).count(),
        "simhash64_lenband": lambda d: dedupe.simhash64_near_pairs(
            d, length_band=True).count(),
        "clusters_from_minhash": lambda d: dedupe.duplicate_clusters(
            dedupe.minhash_lsh_pairs(d, n_hashes=16, n_bands=4)).count(),
    }

    results: dict[str, dict] = {name: {} for name in ops}
    sizes = {}
    for copies, tag in ((1, "1x"), (10, "10x")):
        df = corpus(copies)
        sizes[tag] = df.count()  # materialize cache
        for name, fn in ops.items():
            t0 = time.time()
            rows = fn(df)
            results[name][tag] = {"wall_s": round(time.time() - t0, 2),
                                  "rows": rows}
            print(f"  {tag} {name}: {results[name][tag]}", flush=True)
        df.unpersist()

    print(f"\ncorpus: 1x={sizes['1x']} docs, 10x={sizes['10x']} docs\n")
    print("| operator | 1× wall (s) | 10× wall (s) | growth | 10× output rows |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        growth = round(r["10x"]["wall_s"] / max(r["1x"]["wall_s"], 1e-9), 1)
        print(f"| {name} | {r['1x']['wall_s']} | {r['10x']['wall_s']} "
              f"| {growth}× | {r['10x']['rows']} |")
    print()
    print(json.dumps({"sizes": sizes, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
