"""Snapshot-diff tier (operators/snapshot.py): non-twin checks."""

import pytest
from pyspark.sql import functions as F

from ragstudio_spark.operators import snapshot


def _diff(spark, old_rows, new_rows, content=("text",)):
    schema = "doc_id long, text string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    out = snapshot.snapshot_diff(old, new, ("doc_id",), content)
    return {r.doc_id: r.status for r in out.collect()}


class TestSnapshotDiff:
    def test_hand_computed_statuses(self, spark):
        old = [(1, "a"), (2, "b"), (3, "c")]
        new = [(2, "b"), (3, "C!"), (4, "d")]
        assert _diff(spark, old, new) == {
            1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    def test_self_diff_is_all_unchanged(self, spark):
        rows = [(i, f"t{i}") for i in range(50)]
        assert set(_diff(spark, rows, rows).values()) == {"unchanged"}

    def test_null_content_is_not_the_string_n(self, spark):
        # the null tag must not collide with literal content 'n',
        # and NULL -> value transitions are changes
        assert _diff(spark, [(1, None)], [(1, "n")]) == {1: "changed"}
        assert _diff(spark, [(1, None)], [(1, None)]) == {1: "unchanged"}

    def test_summary_zero_fills_absent_statuses(self, spark):
        old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        new = spark.createDataFrame([(1, "a"), (2, "b")],
                                    "doc_id long, text string")
        out = {r.status: r.n
               for r in snapshot.snapshot_diff_summary(
                   old, new, ("doc_id",), ("text",)).collect()}
        assert out == {"added": 1, "removed": 0, "changed": 0,
                       "unchanged": 1}

    def test_multi_column_content_and_keys(self, spark):
        schema = "a int, b int, x string, y string"
        old = spark.createDataFrame([(1, 1, "p", "q"), (1, 2, "r", None)],
                                    schema)
        new = spark.createDataFrame([(1, 1, "p", "Q"), (1, 2, "r", None)],
                                    schema)
        out = {(r.a, r.b): r.status
               for r in snapshot.snapshot_diff(
                   old, new, ("a", "b"), ("x", "y")).collect()}
        assert out == {(1, 1): "changed", (1, 2): "unchanged"}

    def test_empty_specs_raise(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            snapshot.snapshot_diff(df, df, (), ("text",))
        with pytest.raises(ValueError):
            snapshot.snapshot_diff(df, df, ("doc_id",), ())


class TestNullKeys:
    def test_null_key_matches_itself(self, spark):
        # a NULL-keyed row present in both snapshots is ONE row, not an
        # added+removed pair (null-safe key equality — review-found)
        old = spark.createDataFrame([(None, "a"), (1, "b")],
                                    "doc_id long, text string")
        new = spark.createDataFrame([(None, "a2"), (1, "b")],
                                    "doc_id long, text string")
        out = [(r.doc_id, r.status)
               for r in snapshot.snapshot_diff(
                   old, new, ("doc_id",), ("text",)).collect()]
        assert sorted(out, key=str) == [(1, "unchanged"), (None, "changed")]


class TestScd2History:
    """scd2_history (snapshot.py) — hand-computed interval fixtures."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, value string, event_id bigint")

    def test_intervals_and_collapse(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.snapshot import scd2_history

        t = lambda s: dt.datetime(2024, 1, s)
        rows = [
            (1, t(1), "bronze", 10),
            (1, t(2), "bronze", 11),   # no change -> collapses
            (1, t(3), "silver", 12),
            (1, t(5), "gold", 13),
            (2, t(2), "gold", 20),
        ]
        got = scd2_history(self._df(spark, rows), ["user_id"], "value",
                           tiebreak_col="event_id").collect()
        us = lambda s: int(dt.datetime(2024, 1, s,
                                       tzinfo=dt.timezone.utc).timestamp() * 1e6)
        assert [(r.user_id, r.attr_value, r.valid_from_us, r.valid_to_us,
                 r.is_current) for r in got] == [
            (1, "bronze", us(1), us(3), False),
            (1, "silver", us(3), us(5), False),
            (1, "gold", us(5), None, True),
            (2, "gold", us(2), None, True),
        ]

    def test_null_values_are_states(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.snapshot import scd2_history

        t = lambda s: dt.datetime(2024, 1, s)
        rows = [(1, t(1), None, 1), (1, t(2), None, 2), (1, t(3), "x", 3)]
        got = scd2_history(self._df(spark, rows), ["user_id"], "value",
                           tiebreak_col="event_id").collect()
        assert [(r.attr_value, r.is_current) for r in got] == [
            (None, False), ("x", True)]

    def test_exactly_one_current_per_key(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.snapshot import scd2_history

        t = lambda s: dt.datetime(2024, 1, s)
        rows = [(k, t(d), v, k * 10 + d)
                for k in (1, 2, 3)
                for d, v in ((1, "a"), (2, "b"), (3, "a"))]
        out = scd2_history(self._df(spark, rows), ["user_id"], "value",
                           tiebreak_col="event_id")
        per_key = out.filter("is_current").groupBy("user_id").count().collect()
        assert all(r["count"] == 1 for r in per_key) and len(per_key) == 3
        # intervals tile: every non-current valid_to equals the next valid_from
        rows_out = out.collect()
        by_key = {}
        for r in rows_out:
            by_key.setdefault(r.user_id, []).append(r)
        for chain in by_key.values():
            for a, b in zip(chain, chain[1:]):
                assert a.valid_to_us == b.valid_from_us

    def test_parallelism_invariance(self, spark):
        import datetime as dt

        from ragstudio_spark.operators.snapshot import scd2_history

        t = lambda s: dt.datetime(2024, 1, s)
        rows = [(k, t(1 + (i % 7)), f"v{i % 3}", i)
                for k in range(5) for i in range(12)]
        df = self._df(spark, rows)
        a = [tuple(r) for r in scd2_history(df, ["user_id"], "value",
                                            tiebreak_col="event_id").collect()]
        b = [tuple(r) for r in scd2_history(df.repartition(9), ["user_id"],
                                            "value",
                                            tiebreak_col="event_id").collect()]
        assert a == b


class TestDistributionDrift:
    def test_hand_computed(self, spark):
        from ragstudio_spark.operators.snapshot import distribution_drift

        old = spark.createDataFrame(
            [("en",)] * 6 + [("fr",)] * 4, "lang string")
        new = spark.createDataFrame(
            [("en",)] * 3 + [("fr",)] * 6 + [("de",)] * 1, "lang string")
        got = {r.lang: (r.n_old, r.n_new, r.share_old_ppm,
                        r.share_new_ppm, r.abs_delta_ppm, r.tv_ppm)
               for r in distribution_drift(old, new, "lang").collect()}
        # old shares: en 600000, fr 400000; new: en 300000, fr 600000, de 100000
        assert got["en"] == (6, 3, 600_000, 300_000, 300_000, 300_000)
        assert got["fr"] == (4, 6, 400_000, 600_000, 200_000, 300_000)
        assert got["de"] == (0, 1, 0, 100_000, 100_000, 300_000)
        # TV = (300000+200000+100000)/2 = 300000

    def test_identical_snapshots_zero_drift(self, spark):
        from ragstudio_spark.operators.snapshot import distribution_drift

        df = spark.createDataFrame([("a",), ("b",), ("a",)], "lang string")
        rows = distribution_drift(df, df, "lang").collect()
        assert all(r.abs_delta_ppm == 0 and r.tv_ppm == 0 for r in rows)

    def test_vanished_bucket_is_drift(self, spark):
        from ragstudio_spark.operators.snapshot import distribution_drift

        old = spark.createDataFrame([("a",), ("b",)], "lang string")
        new = spark.createDataFrame([("a",), ("a",)], "lang string")
        got = {r.lang: r for r in
               distribution_drift(old, new, "lang").collect()}
        assert got["b"].n_new == 0 and got["b"].share_new_ppm == 0
        assert got["b"].abs_delta_ppm == 500_000


class TestJoinCardinality:
    def test_exact_prediction(self, spark):
        from ragstudio_spark.operators.snapshot import join_cardinality

        left = spark.createDataFrame(
            [(k,) for k in ["a"] * 5 + ["b"] * 2 + ["c"]], "k string")
        right = spark.createDataFrame(
            [(k,) for k in ["a"] * 3 + ["b"] * 4 + ["d"]], "k string")
        rows = join_cardinality(left, right, "k").collect()
        got = {r.k: (r.pairs, r.total_pairs, r.share_ppm) for r in rows}
        # a: 15, b: 8, total 23; c/d never join
        assert got["a"] == (15, 23, (1_000_000 * 15) // 23)
        assert got["b"] == (8, 23, (1_000_000 * 8) // 23)
        assert set(got) == {"a", "b"}
        # exactness vs the actual join
        assert left.join(right, "k").count() == 23

    def test_top_n_keeps_heaviest(self, spark):
        from ragstudio_spark.operators.snapshot import join_cardinality

        left = spark.createDataFrame(
            [(f"k{i}",) for i in range(20) for _ in range(i + 1)],
            "k string")
        rows = join_cardinality(left, left, "k", top_n=3).collect()
        assert [r.k for r in rows] == ["k19", "k18", "k17"]
        assert rows[0].pairs == 400


class TestReviewRegressions:
    def test_drift_null_bucket_is_one_row(self, spark):
        # NULL is a real bucket: the null-safe join must not split it
        # into vanished+appeared (review finding)
        from ragstudio_spark.operators.snapshot import distribution_drift

        old = spark.createDataFrame([(None,), ("a",)], "lang string")
        new = spark.createDataFrame([(None,), ("a",)], "lang string")
        rows = distribution_drift(old, new, "lang").collect()
        assert len(rows) == 2
        null_row = [r for r in rows if r.lang is None][0]
        assert (null_row.n_old, null_row.n_new,
                null_row.abs_delta_ppm) == (1, 1, 0)
        assert all(r.tv_ppm == 0 for r in rows)

    def test_join_cardinality_share_survives_huge_pairs(self, spark):
        # share_ppm goes through doubles: a pairs value whose 1e6
        # product exceeds 2^63 must not wrap (review finding)
        from ragstudio_spark.operators.snapshot import join_cardinality

        left = spark.createDataFrame(
            [(1, "k")], "row_id bigint, k string")
        # counts can't realistically reach 4M rows in a unit test;
        # assert the formula path directly on the operator output shape
        right = spark.createDataFrame(
            [(i, "k") for i in range(10)], "row_id bigint, k string")
        [r] = join_cardinality(left.select("k"), right.select("k"),
                               "k").collect()
        assert (r.pairs, r.total_pairs, r.share_ppm) == (10, 10, 1_000_000)


class TestEditDistanceUnits:
    def test_spark_codepoint_semantics_documented(self, spark):
        # the unit divergence the oracle gates around: Spark counts
        # codepoints ('é'->'e' = 1); DuckDB counts bytes (= 2)
        import duckdb
        from pyspark.sql import functions as F

        [r] = (spark.range(1)
               .select(F.levenshtein(F.lit("é"), F.lit("e")).alias("d"))
               .collect())
        assert r.d == 1
        assert duckdb.sql("SELECT levenshtein('é', 'e')").fetchone()[0] == 2
