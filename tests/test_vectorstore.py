"""Parquet-backed vector store (reference JSON vector store semantics)."""

import math

import pytest

from pyspark.sql import functions as F

from ragstudio_spark.operators import vectorstore as vs


@pytest.fixture()
def store_df(spark):
    rows = [
        ("a", "alpha text", {"lang": "en"}, [1.0, 0.0, 0.0]),
        ("b", "beta text", {"lang": "fr"}, [0.9, 0.1, 0.0]),
        ("c", "gamma text", {"lang": "en"}, [0.0, 1.0, 0.0]),
        ("d", "delta text", {"lang": "de"}, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(
        rows, "id string, text string, metadata map<string,string>, "
              "embedding array<float>")


class TestPersistence:
    def test_write_read_roundtrip_and_index(self, spark, store_df, tmp_path):
        path = str(tmp_path / "store")
        index = vs.write_store(store_df, path)
        assert index == {"format_version": 1, "count": 4, "dim": 3}
        assert vs.store_info(path)["count"] == 4
        back = vs.read_store(spark, path)
        assert {r["id"]: r["text"] for r in back.collect()} == {
            "a": "alpha text", "b": "beta text", "c": "gamma text",
            "d": "delta text"}

    def test_export_import_jsonl(self, spark, store_df, tmp_path):
        path = str(tmp_path / "exp")
        vs.export_jsonl(store_df, path)
        back = vs.import_jsonl(spark, path)
        orig = {r["id"]: (r["text"], dict(r["metadata"]), list(r["embedding"]))
                for r in store_df.collect()}
        got = {r["id"]: (r["text"], dict(r["metadata"]), list(r["embedding"]))
               for r in back.collect()}
        assert got == orig


class TestMutation:
    def test_upsert_overwrites_by_id(self, spark, store_df):
        new = spark.createDataFrame(
            [("b", "beta v2", {"lang": "fr"}, [0.5, 0.5, 0.0]),
             ("e", "epsilon", {"lang": "en"}, [0.1, 0.1, 0.8])],
            "id string, text string, metadata map<string,string>, "
            "embedding array<float>")
        merged = vs.upsert(store_df, new)
        rows = {r["id"]: r["text"] for r in merged.collect()}
        assert rows == {"a": "alpha text", "b": "beta v2", "c": "gamma text",
                        "d": "delta text", "e": "epsilon"}

    def test_upsert_twice_latest_wins(self, spark, store_df):
        v2 = spark.createDataFrame(
            [("a", "alpha v2", {}, [1.0, 0.0, 0.0])],
            "id string, text string, metadata map<string,string>, embedding array<float>")
        v3 = spark.createDataFrame(
            [("a", "alpha v3", {}, [1.0, 0.0, 0.0])],
            "id string, text string, metadata map<string,string>, embedding array<float>")
        merged = vs.upsert(vs.upsert(store_df, v2), v3)
        assert {r["id"]: r["text"] for r in merged.collect()}["a"] == "alpha v3"

    def test_delete(self, spark, store_df):
        left = vs.delete(store_df, ["b", "d"])
        assert {r["id"] for r in left.collect()} == {"a", "c"}


class TestPipelineIngest:
    def test_chunks_to_store_lifecycle(self, spark, tmp_path):
        """chunk table → vector store → search returns provenance-tagged
        chunks (the reference lifecycle's final ingest step)."""
        from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline
        from ragstudio_spark.sources import transcripts as tsrc

        out = run_pipeline(
            tsrc.transcripts_df(spark, 80, seed=41, partitions=2),
            PipelineConfig())
        path = str(tmp_path / "vstore")
        index = vs.ingest_chunks(out.chunks, path)
        assert index["count"] == out.chunks.count() > 0
        assert index["dim"] == 8

        store = vs.read_store(spark, path)
        probe = store.first()
        hits = vs.search(store, list(probe["embedding"]), k=1).collect()
        assert hits[0]["id"] == probe["id"]          # self is its own NN
        assert set(hits[0]["metadata"]) == {
            "conv_id", "turn_idx", "chunk_index", "strategy"}


class TestSearch:
    def test_cosine_topk_with_scores(self, spark, store_df):
        out = vs.search(store_df, [1.0, 0.0, 0.0], k=2).collect()
        ranked = [r["id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert ranked == ["a", "b"]
        scores = {r["id"]: r["score"] for r in out}
        assert math.isclose(scores["a"], 1.0, rel_tol=1e-6)
        assert scores["b"] < scores["a"]

    def test_fake_embedder_deterministic(self, spark, store_df):
        a = store_df.select(vs.fake_embedding_col(F.col("text")).alias("e")).collect()
        b = store_df.select(vs.fake_embedding_col(F.col("text")).alias("e")).collect()
        assert [list(r["e"]) for r in a] == [list(r["e"]) for r in b]
        assert all(0.0 <= x < 1.0 for r in a for x in r["e"])
