"""SFT pair mining (operators/sft.py)."""

from ragstudio_spark.operators import sft


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


class TestSftPairs:
    def test_extracts_adjacent_user_assistant_pairs(self, spark):
        rows = [
            ("c1", 0, "user", "question one"),
            ("c1", 1, "assistant", "answer one"),
            ("c1", 2, "user", "question two"),
            ("c1", 3, "tool", "tool output"),          # breaks the pair
            ("c1", 4, "assistant", "answer after tool"),
            ("c2", 0, "assistant", "unprompted"),
            ("c2", 1, "user", "late question"),         # no reply follows
        ]
        got = {(r["conv_id"], r["turn_idx"]): (r["prompt"], r["response"])
               for r in sft.sft_pairs(_turns(spark, rows)).collect()}
        assert got == {("c1", 0): ("question one", "answer one")}

    def test_gap_in_turn_index_disqualifies(self, spark):
        rows = [("c1", 0, "user", "q"), ("c1", 5, "assistant", "a")]
        assert sft.sft_pairs(_turns(spark, rows)).count() == 0

    def test_stats_manifest(self, spark):
        rows = [("c1", 0, "user", "qq"), ("c1", 1, "assistant", "aaa"),
                ("c2", 0, "user", "q2"), ("c2", 1, "assistant", "a2")]
        r = sft.sft_pair_stats(sft.sft_pairs(_turns(spark, rows))).first()
        assert r["n_pairs"] == 2 and r["n_conversations"] == 2
        assert r["total_prompt_chars"] == 4
        assert r["total_response_chars"] == 5

    def test_deterministic_across_partitionings(self, spark):
        rows = [("c%d" % (i % 7), i // 7,
                 ["user", "assistant", "tool"][i % 3], f"text {i}")
                for i in range(84)]
        df = _turns(spark, rows)
        a = sorted(map(repr, sft.sft_pairs(df).collect()))
        b = sorted(map(repr, sft.sft_pairs(df.repartition(5)).collect()))
        assert a == b


class TestSftMultiturn:
    def test_history_format_and_cap(self, spark):
        rows = [("c1", i, ["user", "assistant"][i % 2], f"t{i}")
                for i in range(10)]
        out = {r["turn_idx"]: r for r in sft.sft_multiturn(
            _turns(spark, rows), max_context_turns=3).collect()}
        # assistant turns at odd idx; context capped at 3 turns
        assert set(out) == {1, 3, 5, 7, 9}
        assert out[1]["prompt"] == "user: t0"
        assert out[1]["n_context_turns"] == 1
        assert out[7]["prompt"] == "user: t4\nassistant: t5\nuser: t6"
        assert out[7]["n_context_turns"] == 3
        assert out[7]["response"] == "t7"

    def test_requires_user_directly_before(self, spark):
        rows = [("c1", 0, "user", "q"), ("c1", 1, "tool", "x"),
                ("c1", 2, "assistant", "a")]
        assert sft.sft_multiturn(_turns(spark, rows)).count() == 0

    def test_first_turn_assistant_is_skipped(self, spark):
        rows = [("c1", 0, "assistant", "hello")]
        assert sft.sft_multiturn(_turns(spark, rows)).count() == 0


class TestReviewRegressions:
    def test_empty_mine_gives_zero_totals_not_null(self, spark):
        rows = [("c1", 0, "user", "q"), ("c1", 1, "tool", "x")]
        r = sft.sft_pair_stats(sft.sft_pairs(_turns(spark, rows))).first()
        assert (r["total_prompt_chars"], r["total_response_chars"]) == (0, 0)

    def test_null_role_context_counts_match_lines(self, spark):
        rows = [("c1", 0, None, "sys"), ("c1", 1, "user", "q"),
                ("c1", 2, "assistant", "a")]
        r = sft.sft_multiturn(_turns(spark, rows),
                              max_context_turns=4).first()
        assert r["n_context_turns"] == 2
        assert r["prompt"] == ": sys\nuser: q"  # NULL role renders empty

    def test_sort_appears_once_in_plan(self, spark):
        rows = [("c1", i, ["user", "assistant"][i % 2], f"t{i}")
                for i in range(6)]
        plan = (sft.sft_multiturn(_turns(spark, rows))
                ._jdf.queryExecution().optimizedPlan().toString())
        assert plan.count("array_sort") == 1


class TestPreferencePairs:
    def _fb(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id string, feedback_id string, "
                  "numeric_rating double")

    def test_chosen_rejected_with_gap(self, spark):
        rows = [("q1", "f1", 5.0), ("q1", "f2", 2.0), ("q1", "f3", 3.0),
                ("q2", "f4", 4.0), ("q2", "f5", 3.5),     # gap 0.5 < 1.0
                ("q3", "f6", 4.0), ("q3", "f7", None)]    # single rated
        got = {r["query_id"]: (r["chosen_id"], r["rejected_id"],
                               r["chosen_rating"], r["rejected_rating"])
               for r in sft.preference_pairs(self._fb(spark, rows)).collect()}
        assert got == {"q1": ("f1", "f2", 5.0, 2.0)}

    def test_rating_ties_resolve_to_lowest_id(self, spark):
        rows = [("q1", "f9", 5.0), ("q1", "f2", 5.0), ("q1", "f5", 1.0),
                ("q1", "f3", 1.0)]
        r = sft.preference_pairs(self._fb(spark, rows)).first()
        assert (r["chosen_id"], r["rejected_id"]) == ("f2", "f3")

    def test_deterministic_across_partitionings(self, spark):
        rows = [(f"q{i % 5}", f"f{i}", float(1 + (i * 3) % 7))
                for i in range(50)]
        df = self._fb(spark, rows)
        a = sorted(map(repr, sft.preference_pairs(df).collect()))
        b = sorted(map(repr,
                       sft.preference_pairs(df.repartition(7)).collect()))
        assert a == b and len(a) > 0
