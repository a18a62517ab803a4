"""Chunk-eval metrics operators + stateful streaming aggregator."""

import pytest

from pyspark.sql import functions as F

from ragstudio_spark.operators import metrics as metrics_op
from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline
from ragstudio_spark.sources import transcripts as tsrc
from ragstudio_spark.streaming import jobs as stream_jobs


@pytest.fixture(scope="module")
def out(spark):
    res = run_pipeline(
        tsrc.transcripts_df(spark, 200, seed=71, partitions=4), PipelineConfig()
    )
    return {"chunks": res.chunks.cache(), "metrics": res.metrics.cache()}


class TestEvalMetrics:
    def test_eval_metrics_consistency(self, out):
        row = metrics_op.eval_metrics(out["chunks"]).collect()[0]
        assert row["n_chunks"] > 0
        assert row["min_size"] <= row["mean_size"] <= row["max_size"]
        assert 0.0 <= row["consistency"] <= 1.0
        assert (row["empty"] + row["lt_100"] + row["b_100_500"] + row["ge_500"]
                == row["n_chunks"])

    def test_validate_report(self, out):
        rep = metrics_op.validate_chunks_report(out["chunks"]).toPandas()
        assert (rep["n_chunks"] > 0).all()
        assert (rep["duplicate_chunks"] >= 0).all()

    def test_strategy_usage(self, out):
        usage = metrics_op.strategy_usage(out["chunks"]).toPandas()
        assert usage["n_chunks"].sum() == out["chunks"].count()

    def test_run_counters(self, out):
        row = metrics_op.run_counters(out["metrics"]).collect()[0]
        assert row["total"] == 200
        assert row["success"] + row["failed"] + row["skipped"] == 200
        assert 0 < row["success_rate"] <= 1.0


class TestStatefulStreaming:
    def test_state_persists_across_restarts(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        outp = str(tmp_path / "out")
        from ragstudio_spark.sources.transcripts import TRANSCRIPT_SCHEMA

        full = tsrc.transcripts_df(spark, 120, seed=73, partitions=2).cache()
        batch1 = full.filter("turn_idx % 2 = 0")
        batch2 = full.filter("turn_idx % 2 = 1")
        batch1.write.parquet(inp)

        def run_once():
            stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(inp)
            agg = stream_jobs.conversation_state_aggregator(stream)

            def sink(batch_df, batch_id):
                batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append").parquet(outp)

            q = (agg.writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .outputMode("update").trigger(availableNow=True).start())
            q.awaitTermination(120)

        run_once()
        batch2.write.mode("append").parquet(inp)
        run_once()
        got = (
            spark.read.parquet(outp)
            .groupBy("conv_id")
            .agg(F.max("n_turns").alias("n_turns"), F.max("n_chars").alias("n_chars"))
            .toPandas().set_index("conv_id")
        )

        expected = (
            full.groupBy("conv_id")
            .agg(F.count("*").alias("n_turns"),
                 F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("n_chars"))
            .toPandas().set_index("conv_id")
        )
        # every conversation updated in run 2 must show CUMULATIVE totals
        # (state restored from the checkpoint, not restarted from zero)
        for conv_id, row in got.iterrows():
            assert row["n_turns"] == expected.loc[conv_id, "n_turns"]
            assert row["n_chars"] == expected.loc[conv_id, "n_chars"]
        full.unpersist()


class TestToolCallsStream:
    def test_incremental_tool_mining_matches_batch(self, spark, tmp_path):
        """The file-source tool-call stream must, across two incremental
        triggers, produce exactly the batch operator's output."""
        import json

        from ragstudio_spark.operators import toolcalls

        inp = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        outp = str(tmp_path / "out")
        full = tsrc.transcripts_df(spark, 150, seed=77, partitions=2).cache()
        full.filter("turn_idx % 2 = 0").write.parquet(inp)

        q = stream_jobs.tool_calls_stream(spark, inp, outp, ckpt)
        q.awaitTermination(120)
        full.filter("turn_idx % 2 = 1").write.mode("append").parquet(inp)
        q = stream_jobs.tool_calls_stream(spark, inp, outp, ckpt)
        q.awaitTermination(120)

        got = {
            (r["conv_id"], r["turn_idx"]): (r["tool_name"], r["call_id"])
            for r in spark.read.parquet(outp).collect()
        }
        expected = {
            (r["conv_id"], r["turn_idx"]): (r["tool_name"], r["call_id"])
            for r in toolcalls.parse_tool_calls(full).collect()
        }
        assert got == expected and len(got) > 0
        full.unpersist()


class TestErrorTaxonomy:
    def test_ladder_matches_reference_categorizer(self, spark):
        """Each branch + the precedence rule of volume_testing.py
        _categorize_error (ocr outranks pdf; first match wins)."""
        from ragstudio_spark.operators import metrics as m

        cases = [
            ("OCR failed hard", "OCR_ERROR"),
            ("Tesseract missing", "OCR_ERROR"),
            ("pdf broke while parsing", "PARSING_ERROR"),
            ("parsing layout fail", "PARSING_ERROR"),
            ("ocr fallback on pdf page", "OCR_ERROR"),      # precedence
            ("out of MEMORY", "RESOURCE_ERROR"),
            ("timeout after 30s", "RESOURCE_ERROR"),
            ("pdf memory blowup", "PARSING_ERROR"),          # pdf before memory
            ("language not supported", "LANGUAGE_ERROR"),
            ("bad encoding", "LANGUAGE_ERROR"),
            ("mystery boom", "OTHER_ERROR"),
        ]
        df = spark.createDataFrame([(c,) for c, _e in cases], "error string")
        got = [r["cat"] for r in df.select(
            m.classify_error(F.col("error")).alias("cat")).collect()]
        assert got == [e for _c, e in cases]

    def test_rollup_counts_and_null_exclusion(self, spark):
        from ragstudio_spark.operators import metrics as m

        df = spark.createDataFrame(
            [("ocr boom",), ("ocr again",), ("pdf fail",), (None,)],
            "error string")
        got = {r["category"]: r["n_errors"]
               for r in m.error_taxonomy(df).collect()}
        assert got == {"OCR_ERROR": 2, "PARSING_ERROR": 1}
        # classify_error itself maps NULL (success) to NULL, never
        # OTHER_ERROR — callers without a pre-filter must not count
        # successful rows as failures
        cats = [r["c"] for r in df.select(
            m.classify_error(F.col("error")).alias("c")).collect()]
        assert cats.count(None) == 1
