"""Standalone staged operators (extract / normalizer / chunker) — these are
the composable public forms of what the fused operator runs in one hop;
pin them to the fused output so they can't rot."""

import pytest

from pyspark.sql import functions as F

from ragstudio_spark.operators import chunker, extract, fused, normalizer, sniff
from ragstudio_spark.pipeline import iceberg
from ragstudio_spark.sources import transcripts as tsrc

KEY = ["conv_id", "turn_idx", "chunk_index"]


@pytest.fixture(scope="module")
def turns(spark):
    return sniff.with_content_type(
        tsrc.transcripts_df(spark, 150, seed=101, partitions=4)
    ).cache()


class TestStagedEqualsFused:
    def test_staged_chunks_equal_fused(self, spark, turns):
        staged = chunker.explode_chunks(
            chunker.with_chunks(
                extract.with_extracted_text(turns)
            ).select("conv_id", "turn_idx", "chunk_result")
        ).toPandas().sort_values(KEY).reset_index(drop=True)

        fused_out = (
            fused.process_turns(
                turns.select("conv_id", "turn_idx", "text", "content_type"),
                with_normalize=False,
            )
            .select("conv_id", "turn_idx", "extraction_fixes",
                    "page_numbers_removed", F.explode("chunks").alias("chunk"))
            .select("conv_id", "turn_idx", "extraction_fixes",
                    "page_numbers_removed", "chunk.*")
            .toPandas().sort_values(KEY).reset_index(drop=True)
        )
        assert len(staged) == len(fused_out) > 0
        for col in ["chunk_id", "text", "char_start", "char_end",
                    "extraction_fixes", "page_numbers_removed"]:
            assert (staged[col].values == fused_out[col].values).all(), col

    def test_staged_normalizer_matches_fused_metrics(self, spark, turns):
        staged = normalizer.with_normalization(
            extract.with_extracted_text(turns)
        ).select(
            "conv_id", "turn_idx",
            F.col("norm.language").alias("language"),
            F.col("norm.quality_score").alias("quality_score"),
        ).toPandas().set_index(["conv_id", "turn_idx"]).sort_index()

        fd = fused.process_turns(
            turns.select("conv_id", "turn_idx", "text", "content_type")
        ).select("conv_id", "turn_idx", "language", "quality_score").toPandas(
        ).set_index(["conv_id", "turn_idx"]).sort_index()

        assert (staged["quality_score"].values == fd["quality_score"].values).all()
        assert (staged["language"].fillna("∅").values == fd["language"].fillna("∅").values).all()

    def test_language_filter_operator(self, spark, turns):
        df = normalizer.with_normalization(extract.with_extracted_text(turns))
        kept = normalizer.filter_languages(df, allowed=("fr", "en"))
        langs = {r["l"] for r in kept.select(
            F.lower(F.col("norm.language")).alias("l")).distinct().collect()}
        assert langs <= {"fr", "en"}


class TestIcebergAdapter:
    def test_unavailable_in_container_and_fails_loud(self, spark):
        assert not iceberg.iceberg_available(spark)
        with pytest.raises(RuntimeError, match="Iceberg runtime not on the classpath"):
            iceberg.create_tables(spark, "lake", "rag")

    def test_ddl_templates_carry_bucket_spec(self):
        ddl = iceberg.DDL_CHUNKS.format(catalog="lake", db="rag", n_buckets=64)
        assert "bucket(64, conv_id)" in ddl
        assert "USING iceberg" in ddl
