"""Round-6 continuation operators: non-twin checks (CLAUDE.md invariant 6).

Each operator added in the continuation session gets (a) a hand-computed
unit on a fixture small enough to verify by eye and (b) a seeded
randomized differential against a pure-Python replica of the CONTRACT —
independent of both the Spark implementation and the DuckDB twin.
"""

import random

from pyspark.sql import functions as F

from ragstudio_spark.operators import dedupe


def _line_dedup_replica(docs, min_words=5):
    """Contract replica: drop every >=min_words-word line whose text
    occurred at a lexicographically smaller (doc_id, line_idx); shorter
    lines are exempt. docs: list of (doc_id, text)."""
    firsts = {}
    rows = []
    for doc_id, text in docs:
        for idx, line in enumerate(text.split("\n")):
            eligible = len([w for w in line.lower().split() if w]) >= min_words
            rows.append((doc_id, idx, line, eligible))
            if eligible and line not in firsts:
                firsts[line] = (doc_id, idx)
    out = {}
    for doc_id, idx, line, eligible in rows:
        n_lines, n_kept, kept = out.setdefault(doc_id, [0, 0, []])
        keep = (not eligible) or firsts[line] == (doc_id, idx)
        out[doc_id][0] += 1
        out[doc_id][1] += 1 if keep else 0
        if keep:
            kept.append(line)
    return {
        d: (n, k, n - k, "\n".join(kept))
        for d, (n, k, kept) in out.items()
    }


class TestLineDedup:
    def _run(self, spark, docs, **kw):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = dedupe.line_dedup(df, **kw).collect()
        return {r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_dropped"],
                              r["kept_text"]) for r in rows}

    def test_hand_computed(self, spark):
        docs = [
            (1, "alpha beta gamma delta epsilon\nshort line\n"
                "one two three four five six"),
            (2, "alpha beta gamma delta epsilon\nunique words in the second doc\n"
                "short line"),
            (3, "one two three four five six\nalpha beta gamma delta epsilon"),
        ]
        got = self._run(spark, docs)
        # doc 1 is first everywhere: all three lines survive
        assert got[1] == (3, 3, 0,
                          "alpha beta gamma delta epsilon\nshort line\n"
                          "one two three four five six")
        # doc 2: first line is a corpus dup (doc 1 owns it); "short line"
        # has 2 words -> exempt even though duplicated
        assert got[2] == (3, 2, 1,
                          "unique words in the second doc\nshort line")
        # doc 3: both lines already occurred
        assert got[3] == (2, 0, 2, "")

    def test_within_doc_duplicates_drop(self, spark):
        docs = [(7, "a b c d e f\na b c d e f\ntail")]
        got = self._run(spark, docs)
        assert got[7] == (3, 2, 1, "a b c d e f\ntail")

    def test_empty_text_passes_through(self, spark):
        got = self._run(spark, [(1, ""), (2, "")])
        assert got[1] == (1, 1, 0, "")
        assert got[2] == (1, 1, 0, "")

    def test_randomized_vs_replica(self, spark):
        rng = random.Random(0x51DE)
        pool = [
            " ".join(f"w{rng.randrange(30)}" for _ in range(rng.randrange(2, 9)))
            for _ in range(40)
        ]
        docs = [
            (d, "\n".join(rng.choice(pool)
                          for _ in range(rng.randrange(1, 12))))
            for d in range(60)
        ]
        expected = _line_dedup_replica(docs)
        got = self._run(spark, docs)
        assert got == expected
        # at least one drop and one exemption actually exercised
        assert any(v[2] > 0 for v in expected.values())
        assert any(v[1] > 0 and v[2] > 0 for v in expected.values())

    def test_partition_independent(self, spark):
        rng = random.Random(0xFACE)
        pool = ["p q r s t u", "v w x y z zz", "one two"]
        docs = [(d, "\n".join(rng.choice(pool) for _ in range(5)))
                for d in range(20)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        a = {r["doc_id"]: r["kept_text"]
             for r in dedupe.line_dedup(df.coalesce(1)).collect()}
        b = {r["doc_id"]: r["kept_text"]
             for r in dedupe.line_dedup(df.repartition(7)).collect()}
        assert a == b


def _conv_stats_replica(turns):
    """Contract replica. turns: list of (conv_id, turn_idx, role, text)."""
    from collections import defaultdict
    by_conv = defaultdict(list)
    for c, i, r, t in turns:
        by_conv[c].append((i, r, t))
    out = {}
    for c, ts in by_conv.items():
        ts.sort(key=lambda x: (x[0], x[1] is not None, x[1] or ""))
        runs = []
        for i, r, t in ts:
            nw = len((t or "").split())
            if runs and runs[-1]["role"] == r:
                runs[-1]["len"] += 1
                runs[-1]["words"] += nw
                runs[-1]["max_idx"] = max(runs[-1]["max_idx"], i)
            else:
                runs.append({"role": r, "len": 1, "words": nw,
                             "min_idx": i, "max_idx": i})
        n_turns = sum(r["len"] for r in runs)
        n_words = sum(r["words"] for r in runs)
        def n_role(x):
            return sum(r["len"] for r in runs if r["role"] == x)
        first = min(runs, key=lambda r: (r["min_idx"], r["role"] or ""))
        last = max(runs, key=lambda r: (r["max_idx"], r["role"] or ""))
        out[c] = (n_turns, n_role("user"), n_role("assistant"),
                  n_role("tool"), n_role("system"), n_words,
                  len(runs) - 1, max(r["len"] for r in runs),
                  first["role"], last["role"],
                  float(n_words) / n_turns)
    return out


class TestConversationStats:
    COLS = ("n_turns", "n_user", "n_assistant", "n_tool", "n_system",
            "n_words", "n_role_switches", "longest_run", "first_role",
            "last_role", "avg_words")

    def _run(self, spark, turns):
        from ragstudio_spark.operators import convlint
        df = spark.createDataFrame(
            turns, "conv_id string, turn_idx int, role string, text string")
        return {r["conv_id"]: tuple(r[c] for c in self.COLS)
                for r in convlint.conversation_stats(df).collect()}

    def test_hand_computed(self, spark):
        turns = [
            ("c1", 0, "user", "hello there"),
            ("c1", 1, "assistant", "hi"),
            ("c1", 2, "assistant", "how can I help"),
            ("c1", 3, "user", "fix the bug"),
            ("c2", 0, "system", "be terse"),
            ("c2", 1, "user", None),
        ]
        got = self._run(spark, turns)
        assert got["c1"] == (4, 2, 2, 0, 0, 10, 2, 2, "user", "user", 2.5)
        assert got["c2"] == (2, 1, 0, 0, 1, 2, 1, 1, "system", "user", 1.0)

    def test_null_role_breaks_run(self, spark):
        turns = [("c", 0, "user", "a"), ("c", 1, None, "b"),
                 ("c", 2, None, "c"), ("c", 3, "user", "d")]
        got = self._run(spark, turns)
        # runs: user | NULL NULL | user -> 3 runs, longest 2, 2 switches
        assert got["c"][6] == 2 and got["c"][7] == 2
        assert got["c"][1] == 2      # n_user counts only real user turns

    def test_randomized_vs_replica(self, spark):
        rng = random.Random(0xD1A6)
        roles = ["user", "assistant", "tool", "system", None]
        turns = []
        for c in range(15):
            n = rng.randrange(1, 20)
            for i in range(n):
                turns.append((f"c{c}", i, rng.choice(roles),
                              " ".join("w" for _ in range(rng.randrange(0, 6)))
                              or None))
        got = self._run(spark, turns)
        assert got == _conv_stats_replica(turns)

    def test_duplicate_indices_deterministic(self, spark):
        # duplicate turn_idx with different roles: ordered by (idx, role)
        turns = [("c", 0, "user", "a"), ("c", 1, "tool", "b"),
                 ("c", 1, "assistant", "c"), ("c", 2, "user", "d")]
        from ragstudio_spark.operators import convlint
        df = spark.createDataFrame(
            turns, "conv_id string, turn_idx int, role string, text string")
        a = self._run(spark, turns)
        b = {r["conv_id"]: tuple(r[c] for c in self.COLS)
             for r in convlint.conversation_stats(df.repartition(5)).collect()}
        assert a == b
        # order user | assistant | tool | user -> 4 runs
        assert a["c"][6] == 3


class TestSQ8:
    def _cluster_vecs(self, spark, n=64):
        rng = random.Random(17)
        centers = [[6.0, 0, 0, 0, 0, 0, 0, 0], [0, 6.0, 0, 0, 0, 0, 0, 0],
                   [0, 0, 0, 6.0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0, 6.0, 0]]
        rows = [(i, [x + rng.uniform(-0.3, 0.3) for x in centers[i % 4]])
                for i in range(n)]
        return spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    def test_code_range_and_constant_dim(self, spark):
        from ragstudio_spark.operators import similarity
        rows = [(0, [1.0, 5.0, -2.0]), (1, [3.0, 5.0, 2.0]),
                (2, [2.0, 5.0, 0.0])]
        vecs = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        params = similarity.sq8_params(vecs)
        codes = {r["vec_id"]: r["code"]
                 for r in similarity.sq8_encode(vecs, params).collect()}
        # constant dim 1 codes to 0 everywhere; extremes hit 0 and 255
        assert all(c[1] == 0 for c in codes.values())
        assert codes[0][0] == 0 and codes[1][0] == 255
        assert codes[0][2] == 0 and codes[1][2] == 255
        assert all(0 <= x <= 255 for c in codes.values() for x in c)

    def test_reconstruction_error_bound(self, spark):
        """|x_hat - x| <= (max-min)/255 per dimension — the quantization
        error contract."""
        from ragstudio_spark.operators import similarity
        vecs = self._cluster_vecs(spark)
        params = similarity.sq8_params(vecs)
        p = params.collect()[0]
        orig = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
        codes = {r["vec_id"]: r["code"]
                 for r in similarity.sq8_encode(vecs, params).collect()}
        for vid, code in codes.items():
            for d, c in enumerate(code):
                step = (p["maxs"][d] - p["mins"][d]) / 255.0
                x_hat = p["mins"][d] + c * step
                assert abs(x_hat - orig[vid][d]) <= step + 1e-9

    def test_recall_vs_exact_dot(self, spark):
        """SQ8 ranks by (dequantized) DOT PRODUCT, so the ground truth is
        exact dot-product top-k — not brute_force_topk's cosine, which
        legitimately reorders within a cluster (dot favors long vectors,
        cosine aligned ones; measured 0.25 set-overlap between the two
        exact metrics on this fixture)."""
        from pyspark.sql import Window
        from ragstudio_spark.operators import similarity
        vecs = self._cluster_vecs(spark)
        queries = vecs.filter("vec_id < 8")
        approx = similarity.sq8_topk(vecs, queries, k=5)

        q = queries.select(F.col("vec_id").alias("query_id"),
                           F.col("embedding").alias("qv"))
        v = vecs.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("vv"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("neighbor_id"))
        exact = (q.crossJoin(v)
                 .filter("neighbor_id != query_id")
                 .withColumn("score",
                             similarity.dot(F.col("qv"), F.col("vv")))
                 .withColumn("rank", F.row_number().over(w))
                 .filter("rank <= 5"))
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        recall = len(a & e) / len(e)
        # 8-bit per-dim quantization on well-separated clusters keeps
        # the dot-product neighborhood nearly intact
        assert recall >= 0.8, recall
        # and neighbors always come from the query's cluster
        assert all(q_ % 4 == n % 4 for q_, n in a), a


class TestTopicSegments:
    def _run(self, spark, turns, pct=50):
        from ragstudio_spark.operators import convlint
        df = spark.createDataFrame(
            turns, "conv_id string, turn_idx int, text string")
        return {r["conv_id"]: (r["n_turns"], r["n_segments"],
                               r["boundaries"], r["avg_segment_len"])
                for r in convlint.topic_segments(df, threshold_pct=pct)
                        .collect()}

    def test_hand_computed(self, spark):
        turns = [
            ("c", 0, "spark shuffle partition plan"),
            ("c", 1, "shuffle partition plan cost"),   # J=3/5=60% cohere
            ("c", 2, "dinner pasta recipe tonight"),   # J=0 -> cut
            ("c", 3, "pasta recipe sauce"),            # J=2/5=40% -> cut at 50
        ]
        got = self._run(spark, turns)
        assert got["c"] == (4, 3, [2, 3], 4 / 3)
        # at a laxer threshold the 40% boundary coheres
        got30 = self._run(spark, turns, pct=30)
        assert got30["c"] == (4, 2, [2], 2.0)

    def test_exact_threshold_is_not_a_cut(self, spark):
        # J exactly = pct/100 must NOT cut (strict less-than contract)
        turns = [("c", 0, "a b"), ("c", 1, "a c")]   # J = 1/3
        got = self._run(spark, turns, pct=33)        # 100*1 < 33*3=99? no
        assert got["c"][1] == 1
        got34 = self._run(spark, turns, pct=34)      # 100 < 102 -> cut
        assert got34["c"][1] == 2

    def test_empty_turns(self, spark):
        turns = [("c", 0, ""), ("c", 1, ""), ("c", 2, "words now here"),
                 ("c", 3, None)]
        got = self._run(spark, turns)
        # empty-empty coheres; empty->words cuts; words->NULL cuts
        assert got["c"] == (4, 3, [2, 3], 4 / 3)

    def test_single_turn_and_no_boundaries(self, spark):
        turns = [("solo", 0, "only one turn"),
                 ("same", 0, "x y z"), ("same", 1, "x y z")]
        got = self._run(spark, turns)
        assert got["solo"] == (1, 1, [], 1.0)
        assert got["same"] == (2, 1, [], 2.0)
