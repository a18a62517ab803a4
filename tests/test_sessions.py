"""Sessionization operator (gap-based session assignment)."""

from datetime import datetime

from ragstudio_spark.operators import sessions


def _events(spark):
    t = lambda m: datetime(2024, 1, 1, m // 60, m % 60)  # noqa: E731
    rows = [
        # user A: events at 0,10,20 (one session), then 60,65 (second)
        (1, "a", t(0)), (2, "a", t(10)), (3, "a", t(20)),
        (4, "a", t(60)), (5, "a", t(65)),
        # user B: single event
        (6, "b", t(5)),
        # user C: exactly-at-gap boundary (30 min) stays in SAME session
        (7, "c", t(0)), (8, "c", t(30)),
        # and 31 min opens a new one
        (9, "c", t(61)),
    ]
    return spark.createDataFrame(rows, "event_id int, user_id string, ts timestamp")


class TestSessionize:
    def test_gap_boundaries(self, spark):
        out = {r["event_id"]: r["session_seq"]
               for r in sessions.sessionize(_events(spark)).collect()}
        assert out[1] == out[2] == out[3] == 1
        assert out[4] == out[5] == 2
        assert out[6] == 1
        assert out[7] == out[8] == 1      # exactly 30 min: same session (>)
        assert out[9] == 2                # 31 min: new session

    def test_session_ids_and_stats(self, spark):
        stats = {r["session_id"]: r["n_events"]
                 for r in sessions.session_stats(_events(spark)).collect()}
        assert stats == {"a#1": 3, "a#2": 2, "b#1": 1, "c#1": 2, "c#2": 1}

    def test_deterministic_across_partitionings(self, spark):
        one = _events(spark).coalesce(1)
        many = _events(spark).repartition(8)
        a = sorted((r["event_id"], r["session_id"])
                   for r in sessions.sessionize(one).collect())
        b = sorted((r["event_id"], r["session_id"])
                   for r in sessions.sessionize(many).collect())
        assert a == b
