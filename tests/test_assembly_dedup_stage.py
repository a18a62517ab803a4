"""Conversation assembly (skew-safe ordered concat) + chunk-dedup stage."""

import pandas as pd

from pyspark.sql import functions as F

from ragstudio_spark.operators import skew
from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline
from ragstudio_spark.sources import transcripts as tsrc


class TestConversationAssembly:
    def test_matches_naive_ordered_concat(self, spark):
        df = tsrc.transcripts_df(spark, 300, seed=91, partitions=8)
        got = skew.assemble_conversations(df, bucket_size=4).toPandas()
        naive = (
            df.toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .groupby("conv_id")
            .agg(n_turns=("turn_idx", "size"),
                 doc_text=("text", lambda s: "\n\n".join(x or "" for x in s)))
            .reset_index()
        )
        key = "conv_id"
        g = got.sort_values(key).reset_index(drop=True)
        n = naive.sort_values(key).reset_index(drop=True)
        assert (g["n_turns"].values == n["n_turns"].values).all()
        assert (g["doc_text"].values == n["doc_text"].values).all()

    def test_deterministic_across_partitionings(self, spark):
        df1 = tsrc.transcripts_df(spark, 200, seed=93, partitions=1)
        df8 = tsrc.transcripts_df(spark, 200, seed=93, partitions=8)
        a = skew.assemble_conversations(df1).toPandas().sort_values("conv_id").reset_index(drop=True)
        b = skew.assemble_conversations(df8).toPandas().sort_values("conv_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestChunkDedupStage:
    def test_dedupe_removes_corpus_wide_exact_dupes(self, spark):
        # repetitive generator text guarantees cross-turn duplicate chunks
        df = tsrc.transcripts_df(spark, 300, seed=95, partitions=4)
        base = run_pipeline(df, PipelineConfig()).chunks
        deduped = run_pipeline(df, PipelineConfig(dedupe_chunks=True)).chunks
        n_base, n_dedup = base.count(), deduped.count()
        n_distinct = base.select(F.md5("text")).distinct().count()
        assert n_dedup == n_distinct <= n_base
        # surviving copy is the first by (conv_id, turn_idx, chunk_index)
        d = deduped.toPandas()
        assert not d.duplicated(subset=["text"]).any()

    def test_near_dedupe_collapses_mutated_copies(self, spark):
        """'near' mode must also drop chunks that differ by a few tokens
        (exact mode keeps them), and keep the lexicographically-first
        copy of each near-dup cluster."""
        import pytest

        base = tsrc.transcripts_df(spark, 120, seed=99, partitions=2)
        # second copy of every conversation with one appended token per turn
        mutated = base.select(
            F.concat(F.lit("zz_"), F.col("conv_id")).alias("conv_id"),
            "turn_idx", "role",
            F.concat(F.col("text"), F.lit(" zqxmut")).alias("text"),
            "tool", "ts")
        df = base.unionByName(mutated)

        exact = run_pipeline(df, PipelineConfig(dedupe_chunks="exact")).chunks.count()
        near = run_pipeline(df, PipelineConfig(dedupe_chunks="near")).chunks.count()
        assert near < exact  # mutated copies survive exact, not near

        near_df = run_pipeline(df, PipelineConfig(dedupe_chunks="near")).chunks
        # no surviving pair of near-identical texts from the two copies:
        # every zz_ chunk that survives must not have a base twin
        survivors = near_df.select("conv_id", "text").toPandas()
        base_texts = set(survivors[~survivors.conv_id.str.startswith("zz_")]["text"])
        for t in survivors[survivors.conv_id.str.startswith("zz_")]["text"]:
            assert t.replace(" zqxmut", "") not in base_texts

        with pytest.raises(ValueError):
            run_pipeline(df, PipelineConfig(dedupe_chunks="fuzzy"))

    def test_dedupe_deterministic_winner(self, spark):
        df = tsrc.transcripts_df(spark, 200, seed=97, partitions=4)
        a = run_pipeline(df, PipelineConfig(dedupe_chunks=True)).chunks.toPandas()
        b = run_pipeline(df, PipelineConfig(dedupe_chunks=True)).chunks.toPandas()
        key = ["conv_id", "turn_idx", "chunk_index"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )


class TestSkewReport:
    """skew_report / heavy_keys (skew.py) — hand-computed diagnostics."""

    def _df(self, spark):
        # key 'hot': 60 rows; 'a'..'d': 10 each -> n_rows=100, n_keys=5,
        # mean = 100 DIV 5 = 20
        rows = [("hot",)] * 60 + [(k,) for k in "abcd" for _ in range(10)]
        return spark.createDataFrame(rows, "conv_id string")

    def test_report_hand_computed(self, spark):
        from ragstudio_spark.operators.skew import skew_report

        [r] = skew_report(self._df(spark)).collect()
        assert (r.n_rows, r.n_keys, r.max_count) == (100, 5, 60)
        # counts sorted: [10,10,10,10,60]; p50 rank ceil(2.5)=3 -> 10;
        # p99 rank ceil(4.95)=5 -> 60
        assert (r.p50_count, r.p99_count) == (10, 60)
        assert r.skew_factor_ppm == 3_000_000  # 60 / mean 20
        assert r.recommended_salts == 3        # ceil(60/20)

    def test_uniform_keys_need_no_salt(self, spark):
        from ragstudio_spark.operators.skew import skew_report

        df = spark.createDataFrame(
            [(f"k{i % 8}",) for i in range(80)], "conv_id string")
        [r] = skew_report(df).collect()
        assert r.skew_factor_ppm == 1_000_000 and r.recommended_salts == 1

    def test_heavy_keys_threshold(self, spark):
        from ragstudio_spark.operators.skew import heavy_keys

        out = heavy_keys(self._df(spark), multiplier=2).collect()
        assert [(r.conv_id, r.key_count, r.mean_x_ppm) for r in out] == [
            ("hot", 60, 3_000_000)]
        assert heavy_keys(self._df(spark), multiplier=3).count() == 0

    def test_parallelism_invariance(self, spark):
        from ragstudio_spark.operators.skew import skew_report

        df = self._df(spark)
        a = [tuple(r) for r in skew_report(df).collect()]
        b = [tuple(r) for r in skew_report(df.repartition(9)).collect()]
        assert a == b
