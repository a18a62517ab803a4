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


class TestFunnel:
    """funnel (sessions.py) — greedy-earliest ordered completion."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string")

    def test_hand_computed(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import funnel

        t = lambda m: dt.datetime(2024, 1, 1, 12, m)
        us = lambda m: int(t(m).replace(
            tzinfo=dt.timezone.utc).timestamp() * 1e6)
        rows = [
            # user 1 converts: view@1, click@3, purchase@5
            (1, t(1), "view"), (1, t(3), "click"), (1, t(5), "purchase"),
            # user 2: purchase BEFORE click -> chain breaks at step 3
            (2, t(1), "view"), (2, t(4), "click"), (2, t(2), "purchase"),
            # user 3: only views
            (3, t(1), "view"), (3, t(2), "view"),
        ]
        got = {r.user_id: r for r in funnel(
            self._df(spark, rows), ["view", "click", "purchase"]).collect()}
        assert (got[1].step1_us, got[1].step2_us, got[1].step3_us) == (
            us(1), us(3), us(5))
        assert (got[1].n_steps, got[1].converted) == (3, True)
        assert got[2].step3_us is None and got[2].n_steps == 2
        assert (got[3].n_steps, got[3].converted) == (1, False)

    def test_greedy_earliest_finds_valid_chain(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import funnel

        t = lambda m: dt.datetime(2024, 1, 1, 12, m)
        # click@2 precedes the SECOND view@3; greedy takes view@1 ->
        # click@2 -> purchase@4 (a naive last-view approach would fail)
        rows = [(1, t(1), "view"), (1, t(2), "click"),
                (1, t(3), "view"), (1, t(4), "purchase")]
        [r] = funnel(self._df(spark, rows),
                     ["view", "click", "purchase"]).collect()
        assert r.converted

    def test_equal_timestamps_do_not_chain(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import funnel

        t0 = dt.datetime(2024, 1, 1)
        rows = [(1, t0, "view"), (1, t0, "click")]
        [r] = funnel(self._df(spark, rows), ["view", "click"]).collect()
        assert r.n_steps == 1 and not r.converted

    def test_users_without_step1_still_reported(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import funnel

        rows = [(7, dt.datetime(2024, 1, 1), "purchase")]
        [r] = funnel(self._df(spark, rows), ["view", "purchase"]).collect()
        assert (r.user_id, r.n_steps, r.converted) == (7, 0, False)

    def test_parallelism_invariance(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import funnel

        rows = [(u, dt.datetime(2024, 1, 1, 12, (u * 7 + i) % 60),
                 ["view", "click", "purchase"][i % 3])
                for u in range(20) for i in range(9)]
        df = self._df(spark, rows)
        a = [tuple(r) for r in funnel(df, ["view", "click", "purchase"]).collect()]
        b = [tuple(r) for r in funnel(df.repartition(9),
                                      ["view", "click", "purchase"]).collect()]
        assert a == b


class TestCohortRetention:
    def test_hand_computed(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import cohort_retention

        d = lambda n: dt.datetime(1970, 1, 1 + n)  # epoch day n
        rows = [
            # u1 first in period 0, active again period 1
            (1, d(0)), (1, d(8)),
            # u2 first in period 0 only
            (2, d(1)),
            # u3 first in period 1, active periods 1 and 2
            (3, d(7)), (3, d(14)),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        got = {(r.cohort_period, r.period_offset):
               (r.n_active, r.n_cohort, r.retention_ppm)
               for r in cohort_retention(df).collect()}
        assert got[(0, 0)] == (2, 2, 1_000_000)
        assert got[(0, 1)] == (1, 2, 500_000)
        assert got[(1, 0)] == (1, 1, 1_000_000)
        assert got[(1, 1)] == (1, 1, 1_000_000)
        assert len(got) == 4

    def test_offset_zero_always_full(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import cohort_retention

        rows = [(u, dt.datetime(1970, 1, 1 + (u * 3) % 20))
                for u in range(30)]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        for r in cohort_retention(df).collect():
            if r.period_offset == 0:
                assert r.retention_ppm == 1_000_000
            assert 0 < r.n_active <= r.n_cohort


class TestTransitionMatrix:
    def test_hand_computed(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import transition_matrix

        t = lambda m: dt.datetime(2024, 1, 1, 12, m)
        rows = [(1, t(0), "a", 1), (1, t(1), "b", 2), (1, t(2), "a", 3),
                (2, t(0), "a", 4), (2, t(1), "b", 5)]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string, "
                  "event_id bigint")
        got = {(r.from_type, r.to_type): (r.n, r.row_total, r.p_ppm)
               for r in transition_matrix(df).collect()}
        # from a: a->b twice (u1 and u2); from b: b->a once
        assert got[("a", "b")] == (2, 2, 1_000_000)
        assert got[("b", "a")] == (1, 1, 1_000_000)
        assert len(got) == 2

    def test_no_cross_user_transitions(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import transition_matrix

        rows = [(1, dt.datetime(2024, 1, 1), "a", 1),
                (2, dt.datetime(2024, 1, 2), "b", 2)]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string, "
                  "event_id bigint")
        assert transition_matrix(df).count() == 0

    def test_row_normalization_sums(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import transition_matrix

        rows = [(u, dt.datetime(2024, 1, 1, 12, i),
                 "abc"[(u + i) % 3], u * 100 + i)
                for u in range(10) for i in range(20)]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string, "
                  "event_id bigint")
        out = transition_matrix(df).collect()
        from collections import defaultdict
        by_from = defaultdict(int)
        for r in out:
            by_from[r.from_type] += r.n
        for r in out:
            assert r.row_total == by_from[r.from_type]


class TestRollingActive:
    def test_hand_computed(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.sessions import rolling_active

        d = lambda n: dt.datetime(1970, 1, 1 + n)  # epoch day n
        rows = [
            (1, d(0)), (1, d(0)),   # same user twice in one day
            (2, d(0)),
            (1, d(2)),
            (3, d(3)),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        got = {r.day: (r.n_active_1d, r.n_active_wd)
               for r in rolling_active(df, window_days=3).collect()}
        # day 0: dau {1,2}; 3d window [days -2..0] -> {1,2}
        assert got[0] == (2, 2)
        # day 1: dau 0; 3d [-1..1] -> {1,2}
        assert got[1] == (0, 2)
        # day 2: dau {1}; 3d [0..2] -> {1,2}
        assert got[2] == (1, 2)
        # day 3: dau {3}; 3d [1..3] -> {1,3}
        assert got[3] == (1, 2)
        # clipped to observed range [0, 3]
        assert set(got) == {0, 1, 2, 3}

    def test_window_1_equals_dau(self, spark):
        # the fixed n_active_wd name keeps window_days=1 collision-free
        # (a parameterized column name would duplicate n_active_1d)
        import datetime as dt

        from ragstudio_spark.operators.sessions import rolling_active

        rows = [(u, dt.datetime(1970, 1, 1 + (u % 4)))
                for u in range(20)]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        got = rolling_active(df, window_days=1).collect()
        assert got and all(r.n_active_wd == r.n_active_1d for r in got)

    def test_monotone_bound_and_validation(self, spark):
        import datetime as dt

        import pytest as _pytest

        from ragstudio_spark.operators.sessions import rolling_active

        rng_rows = [(u, dt.datetime(1970, 1, 1 + ((u * 3) % 9)))
                    for u in range(30)]
        df = spark.createDataFrame(rng_rows, "user_id bigint, ts timestamp")
        for r in rolling_active(df, window_days=7).collect():
            assert r.n_active_wd >= r.n_active_1d
        with _pytest.raises(ValueError):
            rolling_active(df, window_days=0)


class TestRollingActiveGap:
    def test_dead_stretch_surfaces_as_zero_rows(self, spark):
        # a gap longer than the window must emit (day, 0, 0) rows, not
        # vanish from the report (review finding)
        import datetime as dt

        from ragstudio_spark.operators.sessions import rolling_active

        rows = [(1, dt.datetime(1970, 1, 1)), (2, dt.datetime(1970, 1, 21))]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        got = {r.day: (r.n_active_1d, r.n_active_wd)
               for r in rolling_active(df, window_days=7).collect()}
        assert set(got) == set(range(0, 21))  # dense [0, 20]
        assert got[0] == (1, 1) and got[20] == (1, 1)
        for d in range(7, 20):
            assert got[d] == (0, 0)
        for d in range(1, 7):
            assert got[d] == (0, 1)  # user 1 keeps the window warm
