"""Streaming sessionization (streaming/jobs.session_stats_stream) vs the
batch operator (operators/sessions.session_stats): gap-rule equality,
exactly-once emission, restart continuity."""

import datetime as dt

import pytest

from ragstudio_spark.operators import sessions
from ragstudio_spark.streaming import jobs as stream_jobs

SCHEMA = "user_id bigint, event_id bigint, ts timestamp"
BASE = dt.datetime(2024, 3, 1, 12, 0, 0)
SENTINEL = BASE + dt.timedelta(days=10)


def _events():
    """3 users; gaps chosen so gap=30min splits deterministically."""
    m = lambda n: BASE + dt.timedelta(minutes=n)
    rows = [
        # user 1: two sessions (0-10, then 61-62)
        (1, 100, m(0)), (1, 101, m(5)), (1, 102, m(10)),
        (1, 103, m(61)), (1, 104, m(62)),
        # user 2: one long chained session (each step 29min <= gap)
        (2, 200, m(0)), (2, 201, m(29)), (2, 202, m(58)),
        # user 3: boundary case — exactly gap apart merges (<=)
        (3, 300, m(0)), (3, 301, m(30)),
        # user 3: then strictly beyond the gap -> new session
        (3, 302, m(90)),
    ]
    return rows


def _sentinels():
    """One far-future event per user pushes the watermark past every real
    session so append mode finalizes them; the sentinel sessions stay
    open and are never emitted."""
    return [(u, 900 + u, SENTINEL) for u in (1, 2, 3)]


def _run_stream(spark, inp, ckpt, name):
    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    agg = stream_jobs.session_stats_stream(stream, gap_minutes=30,
                                           watermark="1 minute")
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


def _batch_expected(spark):
    df = spark.createDataFrame(_events(), SCHEMA)
    us = lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    return sorted(
        (r.user_id, us(r.session_start), us(r.session_end), r.n_events)
        for r in sessions.session_stats(df, gap_minutes=30).collect())


class TestStreamingSessionEquality:
    def test_matches_batch_operator(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        spark.createDataFrame(_events() + _sentinels(), SCHEMA) \
            .coalesce(2).write.parquet(inp)
        got = _run_stream(spark, inp, str(tmp_path / "ck"), "sess_eq")
        got_rows = sorted((r.user_id, r.session_start_us, r.session_last_us,
                           r.n_events) for r in got)
        assert got_rows == _batch_expected(spark)
        # sanity on the fixture itself: 5 real sessions
        assert len(got_rows) == 5

    def test_restart_continues_open_sessions(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        ckpt = str(tmp_path / "ck")
        outp = str(tmp_path / "out")

        def run():
            # memory sink cannot recover a checkpoint — parquet sink can
            stream = spark.readStream.schema(SCHEMA).parquet(inp)
            agg = stream_jobs.session_stats_stream(stream, gap_minutes=30,
                                                   watermark="1 minute")
            q = (agg.writeStream.format("parquet").option("path", outp)
                 .outputMode("append").option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        rows = _events()
        # first half ends mid-session for user 1 (events at minute 0-10
        # delivered; 61-62 later) — state must carry across restart
        first = [r for r in rows if r[1] in (100, 101, 102, 200, 300)]
        second = [r for r in rows if r[1] not in (100, 101, 102, 200, 300)]
        spark.createDataFrame(first, SCHEMA).coalesce(1).write.parquet(inp)
        run()
        spark.createDataFrame(second + _sentinels(), SCHEMA) \
            .coalesce(1).write.mode("append").parquet(inp)
        run()
        combined = sorted(
            (r.user_id, r.session_start_us, r.session_last_us, r.n_events)
            for r in spark.read.parquet(outp).collect())
        assert combined == _batch_expected(spark)
        # exactly-once: no session emitted twice across the restart
        assert len(combined) == len(set(combined))


class TestSkewMonitorStream:
    """skew_monitor_stream: cumulative key counts equal the batch
    computation; crash-retry appends are invisible."""

    def _write_keys(self, spark, inp, keys, mode="overwrite"):
        spark.createDataFrame([(k,) for k in keys], "conv_id string") \
            .coalesce(2).write.mode(mode).parquet(inp)

    def test_cumulative_counts_equal_batch(self, spark, tmp_path):
        from ragstudio_spark.streaming import jobs as sj

        inp, store, ck = (str(tmp_path / d) for d in ("in", "st", "ck"))
        keys = ["hot"] * 30 + [f"k{i}" for i in range(10)] * 2
        self._write_keys(spark, inp, keys)
        sj.skew_monitor_stream(spark, inp, store, ck).awaitTermination(120)
        got = {r.conv_id: r.key_count
               for r in sj.read_key_counts(spark, store).collect()}
        assert got["hot"] == 30 and got["k3"] == 2 and len(got) == 11

    def test_incremental_and_diagnosis(self, spark, tmp_path):
        from ragstudio_spark.operators.skew import heavy_keys
        from ragstudio_spark.streaming import jobs as sj

        inp, store, ck = (str(tmp_path / d) for d in ("in", "st", "ck"))
        self._write_keys(spark, inp, ["hot"] * 20 + ["a", "b"])
        sj.skew_monitor_stream(spark, inp, store, ck).awaitTermination(120)
        self._write_keys(spark, inp, ["hot"] * 20 + ["c", "d"],
                         mode="append")
        sj.skew_monitor_stream(spark, inp, store, ck).awaitTermination(120)
        counts = sj.read_key_counts(spark, store)
        got = {r.conv_id: r.key_count for r in counts.collect()}
        assert got["hot"] == 40 and len(got) == 5
        # the merged counts feed the batch diagnostic: explode counts
        # back to rows is unnecessary — heavy_keys over a pre-counted
        # table means re-aggregating, so diagnose directly
        from pyspark.sql import functions as F
        exploded = counts.select(
            F.explode(F.expr("sequence(1, key_count)")).alias("_"),
            "conv_id")
        [r] = heavy_keys(exploded, multiplier=2).collect()
        assert r.conv_id == "hot" and r.key_count == 40

    def test_duplicate_append_invisible(self, spark, tmp_path):
        from ragstudio_spark.streaming import jobs as sj

        inp, store, ck = (str(tmp_path / d) for d in ("in", "st", "ck"))
        self._write_keys(spark, inp, ["x"] * 7 + ["y"])
        sj.skew_monitor_stream(spark, inp, store, ck).awaitTermination(120)
        # simulate a crash retry: re-append the SAME batch partial with
        # the same batch_id (byte-identical rows)
        import pyspark.sql.functions as F
        first = spark.read.parquet(store)
        first.write.mode("append").parquet(store)
        got = {r.conv_id: r.key_count
               for r in sj.read_key_counts(spark, store).collect()}
        assert got == {"x": 7, "y": 1}


class TestStreamingDriftComposition:
    """read_key_counts → distribution_drift_from_counts: the streaming
    observability log feeds the TV drift alarm without re-scanning rows,
    and the result equals the batch row-level drift."""

    def test_streamed_counts_drift_equals_batch_drift(self, spark, tmp_path):
        from ragstudio_spark.operators.snapshot import (
            distribution_drift, distribution_drift_from_counts)
        from ragstudio_spark.streaming import jobs as sj

        old_keys = ["en"] * 6 + ["fr"] * 4
        new_keys = ["en"] * 3 + ["fr"] * 6 + ["de"]

        def stream_counts(tag, keys):
            inp = str(tmp_path / f"in_{tag}")
            store = str(tmp_path / f"st_{tag}")
            ck = str(tmp_path / f"ck_{tag}")
            spark.createDataFrame([(k,) for k in keys], "lang string") \
                .coalesce(2).write.parquet(inp)
            sj.skew_monitor_stream(spark, inp, store, ck,
                                   key_col="lang").awaitTermination(120)
            return sj.read_key_counts(spark, store, key_col="lang")

        streamed = distribution_drift_from_counts(
            stream_counts("old", old_keys), stream_counts("new", new_keys),
            "lang")
        batch = distribution_drift(
            spark.createDataFrame([(k,) for k in old_keys], "lang string"),
            spark.createDataFrame([(k,) for k in new_keys], "lang string"),
            "lang")
        assert [tuple(r) for r in streamed.collect()] == \
               [tuple(r) for r in batch.collect()]
