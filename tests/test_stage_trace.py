"""Per-turn stage-timing trace (reference ProcessingStep/ProcessingTrace)."""

from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline
from ragstudio_spark.sources import transcripts as tsrc


class TestStageTrace:
    def test_trace_records_stages_and_durations(self, spark):
        full = tsrc.transcripts_df(spark, 60, seed=37, partitions=2)
        out = run_pipeline(full, PipelineConfig(with_trace=True, adaptive=True))
        rows = out.metrics.collect()
        assert "stage_trace" in out.metrics.columns
        traced = [r for r in rows if r["status"] == "success"]
        assert traced
        for r in traced:
            stages = [s["stage"] for s in r["stage_trace"]]
            assert stages == ["ingestion", "ocr_detection",
                              "strategy_selection", "chunking"]
            assert all(s["duration_ms"] >= 0.0 for s in r["stage_trace"])
            # final chunking stage records the strategy actually used
            assert r["stage_trace"][-1]["engine"] in (
                "recursive", "semantic", "parent_child", "late")

    def test_trace_off_by_default_and_output_identical(self, spark):
        """Tracing must not perturb results: chunks with/without tracing
        are identical, and the default metrics schema is unchanged."""
        full = tsrc.transcripts_df(spark, 60, seed=37, partitions=2)
        plain = run_pipeline(full, PipelineConfig())
        traced = run_pipeline(full, PipelineConfig(with_trace=True))
        assert "stage_trace" not in plain.metrics.columns
        key = ["conv_id", "turn_idx", "chunk_index"]
        a = plain.chunks.toPandas().sort_values(key).reset_index(drop=True)
        b = traced.chunks.toPandas().sort_values(key).reset_index(drop=True)
        assert a.equals(b)
