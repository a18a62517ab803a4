"""Turn grounding (operators/grounding.py) — hand-computed + property checks.

The hand-computed rows are the non-twin check for this operator: every
ppm below is derived from the literal strings by eye.
"""

import pytest
from pyspark.sql import functions as F

from ragstudio_spark.operators.grounding import turn_grounding


@pytest.fixture(scope="module")
def conv(spark):
    rows = [
        # c1: assistant turn 1 echoes half the user's bigrams
        ("c1", 0, "user", "the quick brown fox jumps"),
        ("c1", 1, "assistant", "the quick red fox runs"),
        # c1 turn 2: user again (must NOT count as grounded target)
        ("c1", 2, "user", "tell me more"),
        # c1 turn 3: fully grounded in turn 0 + turn 2
        ("c1", 3, "assistant", "the quick brown fox"),
        # c2: assistant speaks FIRST — nothing can be grounded
        ("c2", 0, "assistant", "alpha beta gamma"),
        ("c2", 1, "user", "alpha beta gamma"),
        # c2 turn 2: same text as turn 0, now grounded by turn 1
        ("c2", 2, "assistant", "alpha beta gamma"),
        # c3: assistant with <2 words — zero bigrams, NULL ppm
        ("c3", 0, "user", "hello there"),
        ("c3", 1, "assistant", "hi"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


class TestHandComputed:
    def test_rows(self, conv):
        got = {(r.conv_id, r.turn_idx):
               (r.n_bigrams, r.n_grounded, r.grounded_ppm)
               for r in turn_grounding(conv).collect()}
        # c1 t1 bigrams: {the quick, quick red, red fox, fox runs};
        # grounded: only 'the quick' (from t0) -> 1/4
        assert got[("c1", 1)] == (4, 1, 250_000)
        # c1 t3 bigrams: {the quick, quick brown, brown fox} all in t0
        assert got[("c1", 3)] == (3, 3, 1_000_000)
        # c2 t0: user hasn't spoken yet
        assert got[("c2", 0)] == (2, 0, 0)
        # c2 t2: both bigrams grounded by t1
        assert got[("c2", 2)] == (2, 2, 1_000_000)
        # c3 t1: no bigrams -> NULL ppm, turn still present
        assert got[("c3", 1)] == (0, 0, None)
        assert len(got) == 5  # every assistant turn, nothing else

    def test_same_turn_user_text_never_grounds_itself(self, spark):
        rows = [("c", 0, "assistant", "x y"), ("c", 0, "user", "x y")]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")
        [r] = turn_grounding(df).collect()
        assert (r.n_grounded, r.grounded_ppm) == (0, 0)


class TestProperties:
    def test_bounds_and_order(self, conv):
        rows = turn_grounding(conv).collect()
        assert all(0 <= r.n_grounded <= r.n_bigrams for r in rows)
        assert rows == sorted(rows, key=lambda r: (r.conv_id, r.turn_idx))

    def test_parallelism_invariance(self, conv):
        a = [tuple(r) for r in turn_grounding(conv).collect()]
        b = [tuple(r) for r in turn_grounding(conv.repartition(7)).collect()]
        assert a == b

    def test_cross_conversation_isolation(self, spark):
        rows = [("a", 0, "user", "p q"), ("b", 1, "assistant", "p q")]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")
        [r] = turn_grounding(df).collect()
        assert r.n_grounded == 0


class TestReviewRegressions:
    def test_tool_turn_text_never_grounds(self, spark):
        # tool output sharing the assistant's bigrams must not count as
        # grounding (only USER turns ground), and tool turns are excluded
        # before shingling (review finding: wasted dominant shuffle)
        rows = [("c", 0, "tool", "secret tool payload words"),
                ("c", 1, "assistant", "secret tool payload words")]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")
        [r] = turn_grounding(df).collect()
        assert (r.n_bigrams, r.n_grounded) == (3, 0)

    def test_shared_tokenizer_contract(self, spark):
        # multi-space + case handling must match dedupe.words_col exactly
        rows = [("c", 0, "user", "A   B"), ("c", 1, "assistant", "a b")]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")
        [r] = turn_grounding(df).collect()
        assert (r.n_bigrams, r.n_grounded, r.grounded_ppm) == (1, 1, 1_000_000)
