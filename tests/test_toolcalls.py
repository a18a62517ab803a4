"""Tool-call payload mining: operator semantics + pipeline/lineage wiring."""

import json
import os

from ragstudio_spark.operators import toolcalls
from ragstudio_spark.pipeline import lineage
from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline
from ragstudio_spark.sources import transcripts as tsrc


class TestParseToolCalls:
    def test_matches_python_json_loads(self, spark):
        """Differential oracle: JVM from_json == json.loads row-for-row
        over the synthetic transcript corpus."""
        df = tsrc.transcripts_df(spark, 300, seed=7, partitions=4)
        got = {
            (r["conv_id"], r["turn_idx"]):
                (r["tool_name"], r["tool_status"], r["call_id"])
            for r in toolcalls.parse_tool_calls(df).collect()
        }
        expected = {}
        for r in df.select("conv_id", "turn_idx", "tool").collect():
            if r["tool"] is not None:
                body = json.loads(r["tool"])
                expected[(r["conv_id"], r["turn_idx"])] = (
                    body["tool"], body["status"], body["call_id"])
        assert got == expected
        assert len(got) > 0

    def test_malformed_json_yields_nulls_not_failures(self, spark):
        df = spark.createDataFrame(
            [("c1", 0, '{"tool": "x", "status": "ok", "call_id": 1}'),
             ("c1", 1, "{broken"),
             ("c1", 2, None)],
            "conv_id string, turn_idx int, tool string")
        rows = {r["turn_idx"]: r for r in toolcalls.parse_tool_calls(df).collect()}
        assert set(rows) == {0, 1}          # NULL payload filtered out
        assert rows[0]["tool_name"] == "x"
        assert rows[1]["tool_name"] is None  # malformed → NULL fields

    def test_stats_rollup(self, spark):
        df = spark.createDataFrame(
            [("c", i, f'{{"tool": "t{i % 2}", "status": "ok", "call_id": {i}}}')
             for i in range(6)],
            "conv_id string, turn_idx int, tool string")
        stats = {(r["tool_name"], r["tool_status"]): r["n_calls"]
                 for r in toolcalls.tool_call_stats(
                     toolcalls.parse_tool_calls(df)).collect()}
        assert stats == {("t0", "ok"): 3, ("t1", "ok"): 3}


class TestPipelineWiring:
    def test_opt_in_output_and_lineage_table(self, spark, tmp_path):
        full = tsrc.transcripts_df(spark, 120, seed=31, partitions=3)

        out_off = run_pipeline(full, PipelineConfig())
        assert out_off.tool_calls is None

        root = str(tmp_path / "tools")
        lineage.run_with_lineage(
            spark, full, root, "run_1", PipelineConfig(extract_tools=True))
        table = os.path.join(root, "runs", "run_1", "tool_calls")
        assert os.path.isdir(table)
        calls = spark.read.parquet(table)
        n_tool_turns = full.filter("tool IS NOT NULL").count()
        assert calls.count() == n_tool_turns
        assert set(calls.columns) == {
            "conv_id", "turn_idx", "tool_name", "tool_status", "call_id"}
