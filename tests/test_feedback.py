"""Feedback-loop analytics semantics (reference FeedbackCollector,
src/core/rag/feedback_loop.py:414-519)."""

import datetime

import pytest
from pyspark.sql import functions as F

from ragstudio_spark.operators import feedback

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = ("feedback_id string, query_id string, feedback_type string, "
          "score string, numeric_rating double, "
          "source_document_ids array<string>, clicked_documents array<string>, "
          "user_id string, ts timestamp")


def _row(i, qid="q1", ftype="explicit_rating", score=None, rating=None,
         shown=(), clicked=(), hours_ago=0):
    return (f"f{i}", qid, ftype, score, rating, list(shown), list(clicked),
            "u1", TS - datetime.timedelta(hours=hours_ago))


@pytest.fixture
def fb(spark):
    rows = [
        _row(0, score="positive", rating=5.0),
        _row(1, score="positive", rating=4.0),
        _row(2, score="negative", rating=1.0),
        _row(3, score="neutral"),
        _row(4, ftype="flag"),
        _row(5, ftype="click_through", shown=["d1", "d2"], clicked=["d1"]),
        _row(6, ftype="click_through", shown=["d1", "d3"], clicked=[]),
        _row(7, ftype="correction"),
        _row(8, score="negative", rating=2.0, hours_ago=48),
    ]
    return spark.createDataFrame(rows, SCHEMA)


class TestStatistics:
    def test_matches_reference_formulas(self, spark, fb):
        got = feedback.feedback_statistics(fb).first()
        # reference get_statistics: counts over ALL entries, rates /total
        assert got["total"] == 9
        assert got["positive"] == 2 and got["negative"] == 2
        assert got["neutral"] == 1 and got["flags"] == 1
        assert got["positive_rate"] == 2 / 9
        assert got["flag_rate"] == 1 / 9
        assert got["avg_numeric_rating"] == (5.0 + 4.0 + 1.0 + 2.0) / 4

    def test_type_filter_and_time_window(self, spark, fb):
        now = F.lit(TS)
        got = feedback.feedback_statistics(
            fb, feedback_type="explicit_rating").first()
        assert got["total"] == 5 and got["flags"] == 0
        # 24h window drops the 48h-old negative rating
        got = feedback.feedback_statistics(
            fb, time_window_hours=24, now=now).first()
        assert got["total"] == 8 and got["negative"] == 1

    def test_empty_input_and_no_ratings(self, spark):
        empty = spark.createDataFrame([], SCHEMA)
        got = feedback.feedback_statistics(empty).first()
        assert got["total"] == 0
        assert got["avg_numeric_rating"] is None

    def test_invalid_type_rejected(self, spark, fb):
        with pytest.raises(ValueError):
            feedback.feedback_statistics(fb, feedback_type="nope")


class TestProblematicQueries:
    def test_threshold_min_samples_and_order(self, spark):
        rows = (
            [_row(i, qid="bad", score="negative") for i in range(3)]
            + [_row(10 + i, qid="worse", score="negative") for i in range(4)]
            + [_row(20, qid="worse", score="positive")]
            + [_row(30 + i, qid="good", score="positive") for i in range(3)]
            + [_row(40, qid="thin", score="negative")]  # < min_samples
        )
        df = spark.createDataFrame(rows, SCHEMA)
        got = feedback.problematic_queries(df, min_negative_rate=0.5,
                                           min_samples=3).collect()
        assert [r["query_id"] for r in got] == ["bad", "worse"]
        assert got[0]["negative_rate"] == 1.0
        assert got[1]["negative_rate"] == 4 / 5


class TestDocumentCtr:
    def test_ctr_counts(self, spark, fb):
        got = {r["doc_id"]: r for r in feedback.document_ctr(fb).collect()}
        assert got["d1"]["impressions"] == 2 and got["d1"]["clicks"] == 1
        assert got["d1"]["ctr"] == 0.5
        assert got["d2"]["clicks"] == 0 and got["d3"]["clicks"] == 0

    def test_min_impressions_filters(self, spark, fb):
        got = feedback.document_ctr(fb, min_impressions=2).collect()
        assert [r["doc_id"] for r in got] == ["d1"]


class TestCorrections:
    def test_correction_log(self, spark, fb):
        got = feedback.corrections(fb).collect()
        assert [r["feedback_id"] for r in got] == ["f7"]
