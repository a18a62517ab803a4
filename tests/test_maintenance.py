"""Compaction/dedup maintenance for append-only streaming outputs
(pipeline/maintenance.py)."""

import os

from ragstudio_spark.pipeline import maintenance
from ragstudio_spark.pipeline.lineage import COMMIT_MARKER


def _append_batches(spark, path, batches, schema="doc_id bigint, text string"):
    for rows in batches:
        spark.createDataFrame(rows, schema).repartition(4).write.mode(
            "append").parquet(path)


class TestCompaction:
    def test_compacts_files_and_dedups_retry_copies(self, spark, tmp_path):
        path = str(tmp_path / "out")
        b1 = [(i, f"text {i}") for i in range(10)]
        b2 = [(i, f"text {i}") for i in range(10, 20)]
        # crash-retry shape: batch 2 appended twice, byte-identical
        _append_batches(spark, path, [b1, b2, b2])
        stats = maintenance.compact_parquet_dir(
            spark, path, dedup_keys=["doc_id"], target_files=2)
        assert stats["rows"] == 20
        assert stats["files_after"] <= 2 < stats["files_before"]
        got = {(r["doc_id"], r["text"])
               for r in spark.read.parquet(path).collect()}
        assert got == set(b1) | set(b2)
        assert os.path.exists(os.path.join(path, COMMIT_MARKER))

    def test_dedup_is_deterministic_when_versions_differ(self, spark,
                                                         tmp_path):
        path = str(tmp_path / "out")
        _append_batches(spark, path,
                        [[(1, "bbb"), (2, "zzz")], [(1, "aaa")]])
        maintenance.compact_parquet_dir(spark, path, dedup_keys=["doc_id"])
        got = {r["doc_id"]: r["text"]
               for r in spark.read.parquet(path).collect()}
        # keeps the row sorting FIRST over non-key columns — never
        # arbitrary-dropDuplicates
        assert got == {1: "aaa", 2: "zzz"}

    def test_partitioned_layout_preserved_for_ann_index(self, spark,
                                                        tmp_path):
        """Compacting the cell-partitioned IVF-PQ index must keep the
        cell directory layout (the probe path's partition pruning
        depends on it) and leave search results identical."""
        import random

        from ragstudio_spark.operators import similarity

        rng = random.Random(3)
        centers = [[6.0, 0, 0, 0], [0, 6.0, 0, 0],
                   [0, 0, 6.0, 0], [0, 0, 0, 6.0]]
        rows = [(i, [c + rng.uniform(-0.3, 0.3) for c in centers[i % 4]])
                for i in range(32)]
        vecs = spark.createDataFrame(rows,
                                     "vec_id bigint, embedding array<float>")
        cents = similarity.kmeans_centroids(vecs, k=4, iters=2)
        books = similarity.pq_train(vecs, m=2, k=4, iters=1)
        path = str(tmp_path / "idx")
        idx = similarity.ivfpq_index(vecs, cents, books, m=2)
        # two appends (streaming shape) + a duplicate append
        similarity.write_ivfpq_index(idx, path, mode="overwrite")
        idx.write.partitionBy("cell").mode("append").parquet(path)
        before = similarity.ivfpq_topk(
            spark.read.parquet(path), cents, books,
            vecs.filter("vec_id < 2"), k=3, nprobe=2, m=2).collect()
        maintenance.compact_parquet_dir(
            spark, path, dedup_keys=["vec_id"], target_files=1,
            partition_by="cell")
        assert any(d.startswith("cell=") for d in os.listdir(path))
        disk = spark.read.parquet(path)
        assert disk.count() == 32                      # dup append gone
        after = similarity.ivfpq_topk(
            disk, cents, books, vecs.filter("vec_id < 2"),
            k=3, nprobe=2, m=2).collect()
        assert sorted(map(tuple, before)) == sorted(map(tuple, after))

    def test_sweep_removes_stale_attempts(self, spark, tmp_path):
        path = str(tmp_path / "out")
        _append_batches(spark, path, [[(1, "a")]])
        os.makedirs(f"{path}._compact_dead00", exist_ok=True)
        os.makedirs(f"{path}._old_dead11", exist_ok=True)
        assert maintenance.sweep_stale_compactions(path) == 2
        assert not os.path.exists(f"{path}._compact_dead00")
        assert spark.read.parquet(path).count() == 1
