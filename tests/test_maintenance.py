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

    def test_dedup_deterministic_when_only_array_columns_differ(
            self, spark, tmp_path):
        """Array columns participate in the version pick (Spark orders
        arrays lexicographically) — the tables this module targets
        (embedding, PQ codes) differ per key exactly there, and
        excluding them made the survivor arbitrary (review-found)."""
        path = str(tmp_path / "vecs")
        schema = "vec_id bigint, embedding array<float>"
        spark.createDataFrame(
            [(1, [2.0, 9.0]), (2, [5.0, 5.0])], schema
        ).repartition(3).write.mode("append").parquet(path)
        spark.createDataFrame(
            [(1, [1.0, 99.0])], schema
        ).repartition(3).write.mode("append").parquet(path)
        maintenance.compact_parquet_dir(spark, path, dedup_keys=["vec_id"])
        got = {r["vec_id"]: r["embedding"]
               for r in spark.read.parquet(path).collect()}
        # keeps the array that sorts first, never an arbitrary survivor
        assert got == {1: [1.0, 99.0], 2: [5.0, 5.0]}

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

    def test_crash_between_renames_recovers_not_deletes(self, spark,
                                                        tmp_path):
        """The exact crash window the swap has: path renamed away, the
        new dir not yet renamed in. Recovery (run by BOTH public entry
        points) must restore the original — never delete the only copy
        (review-found: the first sweep implementation rmtree'd both
        sides)."""
        path = str(tmp_path / "out")
        _append_batches(spark, path, [[(i, f"t{i}") for i in range(5)]])
        os.rename(path, f"{path}._old_crash1")          # simulate crash
        os.makedirs(f"{path}._compact_crash2", exist_ok=True)
        assert maintenance.sweep_stale_compactions(path) >= 1
        assert {r["doc_id"] for r in spark.read.parquet(path).collect()} \
            == set(range(5))
        assert not os.path.exists(f"{path}._compact_crash2")

    def test_compact_after_crash_recovers_then_compacts(self, spark,
                                                        tmp_path):
        path = str(tmp_path / "out")
        _append_batches(spark, path, [[(i, f"t{i}") for i in range(6)]])
        os.rename(path, f"{path}._old_crashA")
        stats = maintenance.compact_parquet_dir(
            spark, path, dedup_keys=["doc_id"], target_files=1)
        assert stats["recovered"] is True
        assert stats["rows"] == 6
        assert not os.path.exists(f"{path}._old_crashA")

    def test_partitioned_target_files_bounds_files_per_cell(self, spark,
                                                            tmp_path):
        """A LARGE partition value must split into up to target_files
        files (the salt), not collapse to one file per cell."""
        path = str(tmp_path / "big")
        rows = [(i, i % 2, f"text {i}") for i in range(400)]
        spark.createDataFrame(
            rows, "doc_id bigint, cell int, text string"
        ).repartition(16).write.partitionBy("cell").parquet(path)
        maintenance.compact_parquet_dir(spark, path, target_files=4,
                                        partition_by="cell")
        for cell in (0, 1):
            n = sum(1 for f in os.listdir(os.path.join(path, f"cell={cell}"))
                    if f.endswith(".parquet"))
            assert 1 < n <= 4, (cell, n)
        got = {r["doc_id"] for r in spark.read.parquet(path).collect()}
        assert got == set(range(400))


class TestForgetRewrite:
    """forget_rewrite (maintenance.py) — compliance deletes under the
    crash contract."""

    def _seed(self, spark, path, n=20):
        (spark.range(n)
         .selectExpr("id AS user_id", "CAST(id * 10 AS DOUBLE) AS value")
         .coalesce(2).write.mode("overwrite").parquet(path))

    def test_rows_physically_removed(self, spark, tmp_path):
        from ragstudio_spark.pipeline.maintenance import forget_rewrite

        path = str(tmp_path / "t")
        self._seed(spark, path)
        acc = forget_rewrite(spark, path, "user_id", [3, 7, 99])
        assert acc == {"n_before": 20, "n_removed": 2, "n_after": 18}
        left = {r.user_id for r in spark.read.parquet(path).collect()}
        assert 3 not in left and 7 not in left and len(left) == 18
        # no leftover tmp/old siblings
        import os
        assert not [e for e in os.listdir(tmp_path)
                    if "._compact_" in e or "._old_" in e]

    def test_dataframe_forget_list(self, spark, tmp_path):
        from ragstudio_spark.pipeline.maintenance import forget_rewrite

        path = str(tmp_path / "t")
        self._seed(spark, path)
        forget = spark.range(5).selectExpr("id AS user_id")
        acc = forget_rewrite(spark, path, "user_id", forget)
        assert acc["n_removed"] == 5 and acc["n_after"] == 15

    def test_forget_everything_leaves_empty_committed_table(self, spark,
                                                            tmp_path):
        from ragstudio_spark.pipeline.maintenance import forget_rewrite

        path = str(tmp_path / "t")
        self._seed(spark, path, n=4)
        acc = forget_rewrite(spark, path, "user_id", [0, 1, 2, 3])
        assert acc["n_after"] == 0
        assert spark.read.schema("user_id bigint, value double") \
            .parquet(path).count() == 0

    def test_noop_forget_list_keeps_all(self, spark, tmp_path):
        from ragstudio_spark.pipeline.maintenance import forget_rewrite

        path = str(tmp_path / "t")
        self._seed(spark, path)
        acc = forget_rewrite(spark, path, "user_id", [999])
        assert acc == {"n_before": 20, "n_removed": 0, "n_after": 20}
