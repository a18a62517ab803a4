"""mapInArrow variant of the fused hop (operators/fused.py) — must be
row-identical to the mapInPandas path in every mode.

Measured A/B at sf0.1/50k turns (interleaved min-of-4, warm fleet):
pandas 3.56 s vs arrow 3.52 s on pipeline_extract_chunk — 1.01×, below
the 1.15× adoption bar, so pandas stays the default and the arrow path
is an option (BASELINE.md records the trial). The conclusion matters:
the hop's overhead above kernel compute is worker scheduling + IPC, not
the pandas conversion layer.
"""

from pyspark.sql import functions as F

from ragstudio_spark.operators.fused import process_turns
from ragstudio_spark.operators.sniff import with_content_type


def _input(spark):
    # real timestamps on most rows (plus one NULL): the arrow engine's ts
    # passthrough/cast branch must be exercised with concrete event-time
    # instants, not just NULLs — a tz mis-cast would shift values silently
    from datetime import datetime, timedelta

    t0 = datetime(2024, 3, 1, 12, 30, 15)

    def ts(i):
        return t0 + timedelta(seconds=i)

    rows = [
        ("c1", 0, "<html><body><nav>m</nav><p>"
         + "Real paragraph content here. " * 40 + "</p></body></html>",
         None, ts(0)),
        ("c1", 1, "plain text turn with several sentences. " * 30,
         None, ts(1)),
        ("c2", 0, "", None, ts(2)),
        ("c2", 1, None, None, None),
        ("c2", 2, "# Markdown\n\nSome **bold** content. " * 20, None, ts(3)),
        ("c3", 0, "l i k e   t h i s  \x00 garbage " * 10, None, ts(4)),
        ("c4", 0, "héllo wörld — des données accentuées. " * 25,
         None, ts(5)),
    ]
    return with_content_type(spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, text string, tool string, ts timestamp"))


class TestArrowEngineEquality:
    def test_rows_identical_across_engines_and_modes(self, spark):
        df = _input(spark)
        for kw in (dict(), dict(adaptive=True), dict(materialize_text=False),
                   dict(carry_ts=True)):
            a = process_turns(df, python_engine="pandas", **kw)
            b = process_turns(df, python_engine="arrow", **kw)
            assert a.schema == b.schema, kw
            ra = sorted(map(repr, a.collect()))
            rb = sorted(map(repr, b.collect()))
            assert ra == rb, kw

    def test_trace_mode_same_stages(self, spark):
        df = _input(spark)
        a = process_turns(df, python_engine="pandas", with_trace=True)
        b = process_turns(df, python_engine="arrow", with_trace=True)
        key = ["conv_id", "turn_idx"]
        sa = [[(s["stage"], s["engine"]) for s in r["stage_trace"]]
              for r in a.orderBy(*key).collect()]
        sb = [[(s["stage"], s["engine"]) for s in r["stage_trace"]]
              for r in b.orderBy(*key).collect()]
        assert sa == sb
        # durations differ run-to-run; everything else must not
        drop = [F.col("stage_trace")]
        assert (sorted(map(repr, a.drop(*drop).collect()))
                == sorted(map(repr, b.drop(*drop).collect())))

    def test_plan_uses_map_in_arrow_node(self, spark):
        df = _input(spark)
        plan = (process_turns(df, python_engine="arrow")
                ._jdf.queryExecution().executedPlan().toString())
        assert "MapInArrow" in plan
        assert "MapInPandas" not in plan

    def test_rejects_unknown_engine(self, spark):
        import pytest

        with pytest.raises(ValueError, match="python_engine"):
            process_turns(_input(spark), python_engine="polars")
