"""As-of join tier (operators/asof.py): non-twin checks."""

from datetime import datetime

import pytest

from ragstudio_spark.operators.asof import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _frames(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, "lid long, ts timestamp, k long")
    r = spark.createDataFrame(right_rows,
                              "rid long, ts timestamp, k long, v long")
    return l, r


def _run(spark, left_rows, right_rows, **kw):
    l, r = _frames(spark, left_rows, right_rows)
    out = asof_join(l, r, right_cols=("rid", "v"), by=("k",),
                    right_tiebreak="rid", **kw)
    return {row.lid: (row.rid, row.v) for row in out.collect()}


class TestAsofJoin:
    def test_hand_computed_latest_prior(self, spark):
        left = [(1, _ts(10), 0), (2, _ts(20), 0), (3, _ts(5), 0)]
        right = [(100, _ts(8), 0, 7), (101, _ts(15), 0, 8),
                 (102, _ts(30), 0, 9)]
        assert _run(spark, left, right) == {
            1: (100, 7), 2: (101, 8), 3: (None, None)}

    def test_equal_timestamp_is_inclusive(self, spark):
        # a right row AT the left row's ts matches ("<=", not "<")
        left = [(1, _ts(10), 0)]
        right = [(100, _ts(10), 0, 7)]
        assert _run(spark, left, right) == {1: (100, 7)}

    def test_right_ties_pick_largest_tiebreak(self, spark):
        left = [(1, _ts(10), 0)]
        right = [(100, _ts(5), 0, 7), (105, _ts(5), 0, 8),
                 (101, _ts(5), 0, 9)]
        assert _run(spark, left, right) == {1: (105, 8)}

    def test_keys_do_not_leak_across_groups(self, spark):
        left = [(1, _ts(10), 0), (2, _ts(10), 1)]
        right = [(100, _ts(5), 0, 7)]
        assert _run(spark, left, right) == {1: (100, 7), 2: (None, None)}

    def test_tolerance_nulls_stale_matches(self, spark):
        left = [(1, _ts(10), 0), (2, _ts(50), 0)]
        right = [(100, _ts(8), 0, 7)]
        got = _run(spark, left, right, tolerance_s=5.0)
        assert got == {1: (100, 7), 2: (None, None)}

    def test_partition_independence(self, spark):
        left = [(i, _ts(i % 50), i % 5) for i in range(200)]
        right = [(1000 + i, _ts((i * 7) % 50), i % 5, i) for i in range(80)]
        l, r = _frames(spark, left, right)
        a = sorted(map(tuple, asof_join(
            l.repartition(1), r.repartition(1), right_cols=("rid", "v"),
            by=("k",), right_tiebreak="rid").collect()))
        b = sorted(map(tuple, asof_join(
            l.repartition(17), r.repartition(13), right_cols=("rid", "v"),
            by=("k",), right_tiebreak="rid").collect()))
        assert a == b and a

    def test_overlapping_names_are_suffixed(self, spark):
        l, r = _frames(spark, [(1, _ts(10), 0)], [(9, _ts(5), 0, 3)])
        out = asof_join(l, r, right_cols=("rid", "v"), by=("k",))
        assert set(out.columns) == {"lid", "ts", "k", "rid", "v",
                                    "ts_asof"}
        l2 = l.withColumnRenamed("lid", "rid")
        out2 = asof_join(l2, r, right_cols=("rid", "v"), by=("k",))
        assert "rid_asof" in out2.columns

    def test_empty_right_cols_raise(self, spark):
        l, r = _frames(spark, [(1, _ts(1), 0)], [(2, _ts(1), 0, 1)])
        with pytest.raises(ValueError):
            asof_join(l, r, right_cols=(), by=("k",))


class TestAsofNullSemantics:
    def test_null_ts_right_rows_never_match(self, spark):
        # a NULL-ts right row must not act as ts = -infinity
        # (equi-ASOF semantics: NULL comparisons never match)
        left = [(1, _ts(5), 0)]
        right = [(100, None, 0, 7), (101, _ts(50), 0, 8)]
        assert _run(spark, left, right) == {1: (None, None)}

    def test_null_key_rows_never_match_each_other(self, spark):
        left = [(1, _ts(5), None)]
        right = [(100, _ts(1), None, 7)]
        assert _run(spark, left, right) == {1: (None, None)}

    def test_null_ts_left_row_gets_no_match(self, spark):
        left = [(1, None, 0)]
        right = [(100, _ts(1), 0, 7)]
        assert _run(spark, left, right) == {1: (None, None)}

    def test_ts_in_right_cols_rejected(self, spark):
        l, r = _frames(spark, [(1, _ts(1), 0)], [(2, _ts(1), 0, 1)])
        with pytest.raises(ValueError):
            asof_join(l, r, right_cols=("ts", "v"), by=("k",))

    def test_minimal_left_frame_works(self, spark):
        # left consisting of ONLY key + ts (no extra payload columns)
        l = spark.createDataFrame([(_ts(10), 0)], "ts timestamp, k long")
        r = spark.createDataFrame([(9, _ts(5), 0, 3)],
                                  "rid long, ts timestamp, k long, v long")
        out = asof_join(l, r, right_cols=("rid", "v"), by=("k",)).collect()
        assert out[0].rid == 9 and out[0].v == 3
