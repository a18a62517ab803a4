"""Data-quality expectations (operators/expectations.py) — hand-computed
rule evaluations, the single-scan contract, and eager validation."""

import pytest
from pyspark.sql import functions as F

from ragstudio_spark.operators.expectations import expectations_report


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "en", 10.0, "a@b.co"),
        (2, "en", -5.0, "bad"),
        (3, None, 50.0, None),
        (3, "xx", 200.0, "c@d.eu"),
        (4, "fr", 99.9, "e@f.io"),
    ]
    return spark.createDataFrame(
        rows, "id bigint, lang string, score double, email string")


RULES = [
    {"type": "not_null", "col": "lang"},
    {"type": "unique", "cols": ["id"]},
    {"type": "accepted_values", "col": "lang", "values": ["en", "fr"]},
    {"type": "range", "col": "score", "lo": 0.0, "hi": 100.0},
    {"type": "regex", "col": "email",
     "pattern": r"^[^@\s]+@[^@\s]+\.[a-z]+$"},
]


class TestExpectations:
    def test_hand_computed(self, df):
        got = {r.rule_id: (r.rule_type, r.target, r.n_violations,
                           r.n_rows, r.passed)
               for r in expectations_report(df, RULES).collect()}
        assert got[0] == ("not_null", "lang", 1, 5, False)
        assert got[1] == ("unique", "id", 1, 5, False)   # id=3 twice
        # accepted_values: NULL + 'xx' violate -> 2
        assert got[2] == ("accepted_values", "lang", 2, 5, False)
        # range: -5 and 200 violate -> 2
        assert got[3] == ("range", "score", 2, 5, False)
        # regex: 'bad' violates; NULL does NOT (regex is non-NULL-scoped)
        assert got[4] == ("regex", "email", 1, 5, False)

    def test_clean_table_passes(self, spark):
        clean = spark.createDataFrame(
            [(1, "en", 1.0, "a@b.co"), (2, "fr", 2.0, "c@d.eu")],
            "id bigint, lang string, score double, email string")
        rows = expectations_report(clean, RULES).collect()
        assert all(r.passed and r.n_violations == 0 for r in rows)

    def test_row_local_rules_are_one_scan(self, df):
        row_local = [r for r in RULES if r["type"] != "unique"]
        plan = expectations_report(df, row_local) \
            ._jdf.queryExecution().executedPlan().toString()
        # one aggregate over the table: a single scan of the source
        assert plan.count("Scan ExistingRDD") == 1

    def test_validation_fails_fast(self, df):
        for bad in ([{"type": "nope", "col": "x"}],
                    [{"type": "unique", "cols": []}],
                    [{"type": "range", "col": "score", "lo": 0}],
                    [{"type": "regex", "col": "email", "pattern": "("}],
                    []):
            with pytest.raises(Exception):
                expectations_report(df, bad)

    def test_empty_table(self, spark):
        empty = spark.createDataFrame([], "id bigint, lang string")
        got = expectations_report(
            empty, [{"type": "not_null", "col": "lang"},
                    {"type": "unique", "cols": ["id"]}]).collect()
        assert all(r.n_violations == 0 and r.n_rows == 0 and r.passed
                   for r in got)


class TestReviewRegressions:
    def test_unique_exempts_null_keys(self, spark):
        # dbt/GE semantics: NULL keys never violate uniqueness
        rows = [(None, "a"), (None, "b"), (1, "c"), (1, "d"), (2, "e")]
        df = spark.createDataFrame(rows, "id bigint, x string")
        [r] = expectations_report(
            df, [{"type": "unique", "cols": ["id"]}]).collect()
        # only id=1 duplicates among non-NULL keys; n_rows counts the
        # 3 checked rows
        assert (r.n_violations, r.n_rows, r.passed) == (1, 3, False)

    def test_regex_validated_with_java_semantics(self, df):
        # \p{Lower} is valid Java regex but invalid Python re — it must
        # be ACCEPTED; Python-only named groups are invalid in Java and
        # must be rejected eagerly, as must a missing pattern key
        [r] = expectations_report(
            df, [{"type": "regex", "col": "lang",
                  "pattern": r"\p{Lower}+"}]).collect()
        # lang values en/en/NULL/xx/fr: every non-NULL value contains a
        # lowercase run (rlike is a contains-match), NULL is skipped
        assert r.n_violations == 0
        with pytest.raises(ValueError):
            expectations_report(df, [{"type": "regex", "col": "lang",
                                      "pattern": "(?P<u>[a-z]+)"}])
        with pytest.raises(ValueError):
            expectations_report(df, [{"type": "regex", "col": "lang"}])
