"""Seeded randomized property tests for the round-5 operator tier:
invariants asserted over one generated corpus per test (deterministic
seed, single Spark job — the distributed analogue of the kernel's
hypothesis suites)."""

import random
import re
import string

from pyspark.sql import functions as F

from ragstudio_spark.operators import convlint, lm_filter
from ragstudio_spark.operators import quality_model as qm

_RNG = random.Random(20240817)


def _word(rng):
    return "".join(rng.choice(string.ascii_lowercase)
                   for _ in range(rng.randint(1, 9)))


def _text(rng, max_words=40):
    n = rng.randint(0, max_words)
    parts = []
    for _ in range(n):
        w = _word(rng)
        if rng.random() < 0.1:
            w = w.upper()
        if rng.random() < 0.1:
            w += rng.choice(".!?,;#")
        if rng.random() < 0.05:
            w = str(rng.randint(0, 99999))
        parts.append(w)
    return " ".join(parts) if parts else rng.choice(["", " "])


class TestTruncateHistoryProperties:
    def test_kept_is_a_budgeted_suffix_everywhere(self, spark):
        rng = random.Random(_RNG.random())
        rows = []
        for c in range(30):
            for t in range(rng.randint(1, 25)):
                rows.append((f"c{c}", t,
                             None if rng.random() < 0.05 else _text(rng)))
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string")
        budget = 40
        out = convlint.truncate_history(df, budget_tokens=budget).collect()
        by_conv: dict[str, list] = {}
        for r in out:
            by_conv.setdefault(r["conv_id"], []).append(r)
        for conv, rs in by_conv.items():
            rs.sort(key=lambda r: r["turn_idx"])
            kept = [r for r in rs if r["kept"]]
            # (a) newest turn always kept
            assert rs[-1]["kept"] is True
            # (b) kept set is a SUFFIX by turn index
            if kept:
                cut = min(r["turn_idx"] for r in kept)
                assert all(r["kept"] for r in rs if r["turn_idx"] >= cut)
                assert all(not r["kept"] for r in rs if r["turn_idx"] < cut)
            # (c) kept token mass fits the budget, unless the newest
            #     turn alone exceeds it
            mass = sum(r["turn_tokens"] for r in kept)
            assert mass <= budget or kept == [rs[-1]]
            # (d) suffix_tokens really is the newest-first running sum
            running = 0
            for r in reversed(rs):
                running += r["turn_tokens"]
                assert r["suffix_tokens"] == running


class TestLmFamiliarityProperties:
    def test_accounting_bounds_hold(self, spark):
        rng = random.Random(_RNG.random())
        ref = spark.createDataFrame(
            [(i, _text(rng)) for i in range(40)], "doc_id int, text string")
        docs = spark.createDataFrame(
            [(i, None if rng.random() < 0.05 else _text(rng))
             for i in range(120)], "doc_id int, text string")
        cap = 5
        table = lm_filter.bigram_counts(ref)
        out = lm_filter.lm_familiarity(docs, table, hit_cap=cap).collect()
        assert len(out) == 120                       # zero-fill: every doc
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        for r in out:
            words = (texts[r["doc_id"]] or "").lower().split()
            words = [w for w in words if w]
            assert r["n_bigrams"] == max(len(words) - 1, 0)
            assert 0 <= r["n_known"] <= r["n_bigrams"]
            assert r["n_known"] <= r["known_hits"] \
                <= r["n_known"] * cap


class TestConversationLintProperties:
    def test_matches_pure_python_recomputation(self, spark):
        """Full parity: the distributed linter equals a pure-Python
        automaton over the same (idx, role, text) sorted rows — random
        transcripts with duplicate indices, gaps, NULL roles/texts and
        arbitrary role sequences."""
        rng = random.Random(_RNG.random())
        roles = ["system", "user", "assistant", "tool", "wizard", None]
        rows = []
        for c in range(40):
            idx = 0
            for _ in range(rng.randint(1, 15)):
                idx += rng.choice([0, 1, 1, 1, 2, 5])   # dups and gaps
                rows.append((f"c{c}", idx, rng.choice(roles),
                             None if rng.random() < 0.1 else _text(rng, 6)))
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")
        got = {r["conv_id"]: r
               for r in convlint.lint_conversations(df).collect()}

        valid = {f"{a}>{b}" for a, b in convlint.VALID_TRANSITIONS}
        by_conv: dict[str, list] = {}
        for conv, idx, role, text in rows:
            by_conv.setdefault(conv, []).append((idx, role, text))
        for conv, turns in by_conv.items():
            turns.sort(key=lambda t: (t[0], t[1] is not None, t[1] or "",
                                      t[2] is not None, t[2] or ""))
            seen = [t[0] for t in turns]
            n_dup = len(seen) - len(set(seen))
            gaps = (max(seen) - min(seen) + 1) - len(set(seen))
            n_null = sum(1 for t in turns if t[2] is None)
            n_bad_role = sum(1 for t in turns
                             if t[1] not in convlint.ROLES)
            n_bad_trans = sum(
                1 for prev, cur in zip(turns, turns[1:])
                if not (prev[1] in convlint.ROLES
                        and cur[1] in convlint.ROLES
                        and f"{prev[1]}>{cur[1]}" in valid))
            starts = turns[0][1] in ("system", "user")
            r = got[conv]
            assert (r["n_turns"], r["n_dup_idx"], r["index_gaps"],
                    r["n_null_text"], r["n_bad_role"],
                    r["n_bad_transitions"], r["starts_valid"]) == \
                (len(turns), n_dup, gaps, n_null, n_bad_role,
                 n_bad_trans, starts), conv


class TestSemanticDedupProperties:
    def test_survivors_are_cluster_minima(self, spark):
        """semantic_dedup's kept set equals {min id per connected
        component of the near-dup pair graph} ∪ {unpaired vectors} —
        verified with a pure-Python union-find over the operator's own
        pair output."""
        from ragstudio_spark.operators import dedupe

        rng = random.Random(_RNG.random())
        rows = []
        for i in range(60):
            base = [0.0] * 8
            base[i % 8] = 1.0
            rows.append((i, [v + rng.uniform(-0.05, 0.05) for v in base]))
        vecs = spark.createDataFrame(rows,
                                     "vec_id int, embedding array<float>")
        planes = spark.createDataFrame(
            [(p, [1.0 if d == p else -0.3 for d in range(8)])
             for p in range(4)],
            "plane int, embedding array<float>")
        pairs = dedupe.embedding_near_pairs(
            vecs, planes, threshold=0.9).collect()
        kept = {r["vec_id"] for r in dedupe.semantic_dedup(
            vecs, planes, threshold=0.9).collect()}

        parent = {i: i for i in range(60)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for p in pairs:
            a, b = find(p["id_a"]), find(p["id_b"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        comps: dict[int, list[int]] = {}
        for i in range(60):
            comps.setdefault(find(i), []).append(i)
        expected = {min(members) for members in comps.values()}
        assert kept == expected
        assert len(pairs) > 0                       # non-vacuous fixture


class TestQualityModelProperties:
    def test_score_matches_pure_python_on_ascii(self, spark):
        """The JVM feature/score expressions equal a pure-Python
        recomputation (same regexes, ASCII corpus — the dialect-shared
        subset) for every generated document."""
        rng = random.Random(_RNG.random())
        rows = [(i, None if rng.random() < 0.05 else _text(rng))
                for i in range(150)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r["qm_score"]
               for r in qm.with_quality_score(df).collect()}
        stop_re = re.compile(
            r"\b(?:" + "|".join(qm.QM_STOPWORDS) + r")\b")
        for i, text in rows:
            t = text or ""
            words = [w for w in re.split(r"\s+", t) if w]
            feats = {
                "bias": 1,
                "n_words": len(words),
                "n_stop": len(stop_re.findall(t.lower())),
                "n_terminal": len(re.findall(r"[.!?]", t)),
                "n_punct": len(re.findall(r"[^A-Za-z0-9\s]", t)),
                "n_digit": len(re.findall(r"[0-9]", t)),
                "n_upper": len(re.findall(r"[A-Z]", t)),
                "n_long": sum(1 for w in words if len(w) > 15),
            }
            expected = sum(qm.PUBLISHED_WEIGHTS[k] * v
                           for k, v in feats.items())
            assert got[i] == expected, (i, text, feats, got[i], expected)
