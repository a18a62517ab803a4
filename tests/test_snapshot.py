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
