"""Run-history + retry/backoff semantics (reference history.py / retry.py)."""

import pytest

from ragstudio_spark.pipeline import history, lineage
from ragstudio_spark.pipeline.job import PipelineConfig
from ragstudio_spark.sources import transcripts as tsrc


class TestBackoff:
    def test_delays_double_and_cap(self):
        cfg = history.RetryConfig(max_attempts=7, base_delay_s=1.0, max_delay_s=30.0)
        assert history.backoff_delays(cfg) == [1, 2, 4, 8, 16, 30]

    def test_presets(self):
        assert history.PRESETS["standard"].max_attempts == 3
        assert history.backoff_delays(history.PRESETS["standard"]) == [1, 2]

    def test_jitter_deterministic(self):
        cfg = history.RetryConfig(max_attempts=4, jitter=True)
        a = history.backoff_delays(cfg, seed="s1")
        b = history.backoff_delays(cfg, seed="s1")
        c = history.backoff_delays(cfg, seed="s2")
        assert a == b != c
        base = history.backoff_delays(history.RetryConfig(max_attempts=4))
        assert all(0.5 * x <= y < 1.5 * x for x, y in zip(base, a))

    def test_retry_call_succeeds_after_failures(self):
        calls = {"n": 0}
        sleeps = []

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient")
            return "ok"

        out = history.retry_call(flaky, sleep=sleeps.append)
        assert out == "ok"
        assert sleeps == [1, 2]

    def test_retry_call_exhausts(self):
        def always():
            raise RuntimeError("nope")

        with pytest.raises(RuntimeError):
            history.retry_call(always, sleep=lambda _s: None)

    def test_fatal_short_circuits(self):
        calls = {"n": 0}

        def fatal():
            calls["n"] += 1
            raise history.FatalError("bad config")

        with pytest.raises(history.FatalError):
            history.retry_call(fatal, sleep=lambda _s: None)
        assert calls["n"] == 1


class TestHistory:
    @pytest.fixture()
    def root(self, spark, tmp_path):
        root = str(tmp_path / "hist")
        full = tsrc.transcripts_df(spark, 150, seed=61, partitions=4)
        lineage.run_with_lineage(spark, full, root, "run_001")
        return root

    def test_list_runs_and_last_failed(self, spark, root):
        runs = history.list_runs(root)
        assert len(runs) == 1
        assert runs[0]["run_id"] == "run_001"
        # the synthetic corpus always has some garbage turns → failures
        assert runs[0]["failed"] > 0
        assert history.last_failed_run(root)["run_id"] == "run_001"

    def test_retry_reprocesses_only_retryable(self, spark, root):
        full = tsrc.transcripts_df(spark, 150, seed=61, partitions=4)
        before = history.retry_turn_keys(spark, root).count()
        assert before > 0
        summary = history.retry_failed(spark, full, root, "run_002")
        assert summary["total_turns"] == before
        # quality failures are deterministic → they fail again, and their
        # latest status is still retryable (statuses don't multiply)
        after = history.retry_turn_keys(spark, root).count()
        assert after == before
        assert len(history.list_runs(root)) == 2

    def test_latest_status_wins(self, spark, root):
        """A turn that succeeds in a later run must stop being retryable."""
        full = tsrc.transcripts_df(spark, 150, seed=61, partitions=4)
        keys = history.retry_turn_keys(spark, root).collect()
        target = {(r["conv_id"], r["turn_idx"]) for r in keys}
        # run the same keys through a run with min_readable_ratio=0 so they
        # all "succeed" (gate disabled) → latest status success
        subset = full.join(
            spark.createDataFrame(list(target), "conv_id string, turn_idx int"),
            on=["conv_id", "turn_idx"], how="left_semi",
        )
        lineage.run_with_lineage(
            spark, subset, root, "run_002",
            PipelineConfig(min_readable_ratio=0.0), resume=False,
        )
        remaining = history.retry_turn_keys(spark, root)
        # empty turns remain 'empty'→ skipped-status retryable? empty turns
        # have total_chunks 0 and stay non-success even with ratio 0 —
        # exclude them: no previously-FAILED turn should remain failed
        rem = {(r["conv_id"], r["turn_idx"]) for r in remaining.collect()}
        failed_before = {
            (r["conv_id"], r["turn_idx"])
            for r in spark.read.parquet(f"{root}/runs/run_001/metrics")
            .filter("status = 'failed_quality'").collect()
        }
        assert not (rem & failed_before)
