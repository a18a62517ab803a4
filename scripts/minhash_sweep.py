"""MinHash LSH parameter sweep: n_hashes/n_bands recall-vs-cost tradeoff.

Runs minhash_lsh_pairs at several (n_hashes, n_bands) settings over the
sf0.1 documents table, measuring wall time, candidate-pair count, and
recall against the exact shingle-Jaccard ground truth (pairs with
J ≥ 0.7 — the classic LSH target threshold; s-curve knee for r rows/band
at threshold t means t ≈ (1/b)^(1/r)).

Output: one markdown table (paste into BASELINE.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ragstudio_spark.operators import dedupe
    from ragstudio_spark.session import get_spark

    spark = get_spark("minhash-sweep", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32).cache()
    n_docs = docs.count()

    # exact ground truth: near-dup pairs at Jaccard >= 0.7
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in dedupe.jaccard_pairs(docs, min_jaccard=0.7).collect()
    }

    configs = [(8, 2), (8, 4), (16, 2), (16, 4), (16, 8), (32, 8)]
    rows = []
    # warm up the full plan shape once
    dedupe.minhash_lsh_pairs(docs, n_hashes=8, n_bands=2).count()
    for n_hashes, n_bands in configs:
        t0 = time.time()
        cands = {
            (r["doc_a"], r["doc_b"])
            for r in dedupe.minhash_lsh_pairs(
                docs, n_hashes=n_hashes, n_bands=n_bands).collect()
        }
        wall = time.time() - t0
        recall = (len(truth & cands) / len(truth)) if truth else 1.0
        rows.append({
            "n_hashes": n_hashes, "n_bands": n_bands,
            "rows_per_band": n_hashes // n_bands,
            "wall_s": round(wall, 2),
            "candidates": len(cands),
            "recall_at_070": round(recall, 4),
        })
        print(f"  {n_hashes:>2}h/{n_bands}b: {wall:6.2f}s "
              f"{len(cands):>7} cands recall={recall:.3f}", flush=True)

    print(f"\nn_docs={n_docs}  true pairs (J>=0.7): {len(truth)}\n")
    print("| n_hashes | n_bands | rows/band | wall (s) | candidates | recall@J0.7 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_hashes']} | {r['n_bands']} | {r['rows_per_band']} "
              f"| {r['wall_s']} | {r['candidates']} | {r['recall_at_070']} |")
    print()
    print(json.dumps({"n_docs": n_docs, "true_pairs": len(truth), "sweep": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
