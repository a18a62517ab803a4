"""Conversation lint + context-budget truncation (operators/convlint.py)."""

from pyspark.sql import functions as F

from ragstudio_spark.operators import convlint


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


class TestLintConversations:
    def test_clean_conversation_passes(self, spark):
        rows = [("c", 0, "system", "be helpful"),
                ("c", 1, "user", "hi"),
                ("c", 2, "assistant", "hello"),
                ("c", 3, "tool", "{}"),
                ("c", 4, "assistant", "done"),
                ("c", 5, "user", "thanks")]
        r = convlint.lint_conversations(_turns(spark, rows)).first()
        assert r["lint_ok"] is True
        assert r["n_turns"] == 6 and r["index_gaps"] == 0
        assert r["n_bad_transitions"] == 0 and r["starts_valid"] is True

    def test_each_defect_is_counted(self, spark):
        rows = [
            # gap: 0 then 2; dup: two idx-2 rows; NULL text at 3;
            # bad transition user->user; unknown role at 4
            ("d", 0, "user", "a"),
            ("d", 2, "assistant", "b"),
            ("d", 2, "assistant", "b2"),
            ("d", 3, "user", None),
            ("d", 4, "wizard", "c"),
        ]
        r = convlint.lint_conversations(_turns(spark, rows)).first()
        assert r["lint_ok"] is False
        assert r["n_dup_idx"] == 1
        assert r["index_gaps"] == 1          # idx 1 missing in [0..4]
        assert r["n_null_text"] == 1
        assert r["n_bad_role"] == 1
        # deterministic order under the (idx, role, text) tiebreak:
        # (assistant,"b") then (assistant,"b2") at idx 2 →
        # user→assistant ok, assistant→assistant BAD, assistant→user ok,
        # user→wizard BAD — exactly 2
        assert r["n_bad_transitions"] == 2
        assert r["starts_valid"] is True

    def test_invalid_start_and_null_first_role(self, spark):
        a = convlint.lint_conversations(
            _turns(spark, [("a", 0, "assistant", "x")])).first()
        assert a["starts_valid"] is False and a["lint_ok"] is False
        b = convlint.lint_conversations(
            _turns(spark, [("b", 0, None, "x"), ("b", 1, "user", "y")])
        ).first()
        assert b["starts_valid"] is False
        assert b["n_bad_role"] == 1
        # NULL-role row invalidates its adjacent transition
        assert b["n_bad_transitions"] == 1

    def test_null_predecessor_transition_is_bad(self, spark):
        """lag(role) is NULL both for the first row and after a NULL-role
        row — only the first row is exempt (review-guard: first-row
        detection must use row_number, not prev_role.isNull())."""
        rows = [("c", 0, "user", "a"), ("c", 1, None, "b"),
                ("c", 2, "assistant", "c")]
        r = convlint.lint_conversations(_turns(spark, rows)).first()
        # user->NULL bad, NULL->assistant bad
        assert r["n_bad_transitions"] == 2

    def test_contiguous_but_offset_indices_have_no_gap(self, spark):
        rows = [("c", 5, "user", "a"), ("c", 6, "assistant", "b")]
        r = convlint.lint_conversations(_turns(spark, rows)).first()
        assert r["index_gaps"] == 0 and r["lint_ok"] is True

    def test_deterministic_across_partitionings(self, spark):
        """Including DUPLICATE turn indices: an idx-only window order
        would break ties by physical row order and flip transition
        counts across partitionings (review-found; fixed with the
        (idx, role, text) tiebreak)."""
        rows = [(f"c{i % 5}", (i // 5) % 7,          # dup indices per conv
                 ["user", "assistant", "tool", None][i % 4],
                 f"text {i}" if i % 9 else None) for i in range(120)]
        df = _turns(spark, rows)
        a = sorted(map(repr, convlint.lint_conversations(df).collect()))
        b = sorted(map(repr, convlint.lint_conversations(
            df.repartition(11)).collect()))
        assert a == b
        ta = sorted(map(repr, convlint.truncate_history(
            df, budget_tokens=10).collect()))
        tb = sorted(map(repr, convlint.truncate_history(
            df.repartition(11), budget_tokens=10).collect()))
        assert ta == tb


class TestStatefulStreamingLint:
    def test_incremental_equals_batch_for_ordered_arrival(self, spark,
                                                          tmp_path):
        """Two in-order triggers with a restart between them: the final
        per-conversation lint rows (state accumulated across batches and
        a checkpoint restart) must equal the batch linter over the full
        input — defects included (gaps, dups, NULL roles/texts, bad
        transitions, invalid starts)."""
        from pyspark.sql import functions as F

        from ragstudio_spark.streaming import jobs as stream_jobs

        rows = []
        for c in range(6):
            for t in range(8):
                idx = t + (1 if (c == 1 and t >= 4) else 0)   # gap in c1
                role = [None, "user", "assistant", "tool"][
                    (t + c) % 4] if c != 2 else ["user", "assistant"][t % 2]
                text = None if (c == 3 and t == 5) else f"text {c} {t}"
                rows.append((f"c{c}", idx, role, text))
        rows.append(("c4", 3, "assistant", "dup idx row"))    # dup in c4
        schema = "conv_id string, turn_idx int, role string, text string"
        full = spark.createDataFrame(rows, schema)

        inp = str(tmp_path / "in")
        outp = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        full.filter("turn_idx < 4").coalesce(1).write.parquet(inp)

        def run_once():
            stream = spark.readStream.schema(schema).parquet(inp)
            agg = stream_jobs.conversation_lint_aggregator(stream)

            def sink(batch_df, batch_id):
                batch_df.withColumn("_b", F.lit(batch_id)).write.mode(
                    "append").parquet(outp)

            q = (agg.writeStream.foreachBatch(sink)
                 .option("checkpointLocation", ckpt)
                 .outputMode("update").trigger(availableNow=True).start())
            # awaitTermination(timeout) returns False on timeout without
            # raising — an unchecked return would let a second query
            # start against the same checkpoint (review-found)
            assert q.awaitTermination(180), "streaming trigger timed out"

        run_once()
        full.filter("turn_idx >= 4").coalesce(1).write.mode(
            "append").parquet(inp)
        run_once()

        raw = spark.read.parquet(outp).toPandas()
        latest = raw.sort_values("_b").groupby("conv_id").last()
        expected = convlint.lint_conversations(full).toPandas() \
            .set_index("conv_id")
        cols = ["n_turns", "n_dup_idx", "index_gaps", "n_null_text",
                "n_bad_role", "n_bad_transitions", "starts_valid",
                "lint_ok"]
        for conv in expected.index:
            for c in cols:
                assert latest.loc[conv, c] == expected.loc[conv, c], \
                    (conv, c, latest.loc[conv, c], expected.loc[conv, c])


    def test_null_turn_idx_never_crashes_the_stream(self, spark, tmp_path):
        """NULL turn_idx rows flow through the automaton (counted as
        duplicates, matching the batch count − countDistinct formula)
        instead of killing the query with int(NaN) (review-found)."""
        from pyspark.sql import functions as F

        from ragstudio_spark.streaming import jobs as stream_jobs

        schema = "conv_id string, turn_idx int, role string, text string"
        rows = [("c0", 0, "user", "a"), ("c0", None, "assistant", "b"),
                ("c0", 1, "assistant", "c")]
        inp = str(tmp_path / "in")
        outp = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(inp)
        stream = spark.readStream.schema(schema).parquet(inp)
        agg = stream_jobs.conversation_lint_aggregator(stream)
        q = (agg.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(outp))
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        assert q.awaitTermination(180)
        got = spark.read.parquet(outp).first()
        assert got["n_turns"] == 3
        assert got["n_dup_idx"] == 1            # the NULL-idx row
        batch = convlint.lint_conversations(
            spark.createDataFrame(rows, schema)).first()
        assert batch["n_dup_idx"] == got["n_dup_idx"]
        assert batch["n_turns"] == got["n_turns"]


class TestTruncateHistory:
    def test_suffix_budget_keeps_newest(self, spark):
        rows = [("c", i, "user", "x" * 40) for i in range(10)]  # 10 tok each
        out = convlint.truncate_history(
            _turns(spark, rows), budget_tokens=35).collect()
        kept = sorted(r["turn_idx"] for r in out if r["kept"])
        assert kept == [7, 8, 9]            # 3×10 ≤ 35 < 4×10
        by_idx = {r["turn_idx"]: r for r in out}
        assert by_idx[9]["suffix_tokens"] == 10
        assert by_idx[0]["suffix_tokens"] == 100

    def test_oversized_newest_turn_survives(self, spark):
        rows = [("c", 0, "user", "x" * 40), ("c", 1, "assistant", "y" * 4000)]
        out = {r["turn_idx"]: r["kept"] for r in convlint.truncate_history(
            _turns(spark, rows), budget_tokens=50).collect()}
        assert out == {0: False, 1: True}

    def test_null_text_counts_zero_tokens(self, spark):
        rows = [("c", 0, "user", None), ("c", 1, "assistant", "z" * 8)]
        out = {r["turn_idx"]: r for r in convlint.truncate_history(
            _turns(spark, rows), budget_tokens=5).collect()}
        assert out[0]["turn_tokens"] == 0
        assert out[0]["kept"] is True       # 0 + 2 ≤ 5
        assert out[1]["suffix_tokens"] == 2

    def test_rejects_nonpositive_budget(self, spark):
        import pytest

        with pytest.raises(ValueError, match="budget_tokens"):
            convlint.truncate_history(_turns(spark, []), budget_tokens=0)
