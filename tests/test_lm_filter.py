"""Reference-corpus familiarity filter (operators/lm_filter.py)."""

from ragstudio_spark.operators import lm_filter

REF = [(0, "the quick brown fox jumps over the lazy dog near the river"),
       (1, "the quick red fox runs over the old bridge near the town")]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestLmFamiliarity:
    def test_counts_and_zero_fill(self, spark):
        ref = lm_filter.bigram_counts(_docs(spark, REF))
        docs = _docs(spark, [
            (10, "the quick brown fox"),      # 3 bigrams, all known
            (11, "zz yy xx ww"),              # 3 bigrams, none known
            (12, "word"),                     # no bigrams → zero-fill
            (13, None),                       # NULL text → zero-fill
        ])
        out = {r["doc_id"]: r for r in
               lm_filter.lm_familiarity(docs, ref).collect()}
        assert out[10]["n_bigrams"] == 3 and out[10]["n_known"] == 3
        assert out[11]["n_bigrams"] == 3 and out[11]["n_known"] == 0
        # property-test-found regression pin: unmatched bigrams credit
        # ZERO hits (least() skips NULLs, so an unguarded least(NULL,
        # cap) paid the cap per miss)
        assert out[11]["known_hits"] == 0
        assert out[12]["n_bigrams"] == 0 and out[12]["known_hits"] == 0
        assert out[13]["n_bigrams"] == 0
        # 'the quick' occurs twice in the reference → hits weight 2+1+1
        assert out[10]["known_hits"] == 4

    def test_duplicate_occurrences_count_mass(self, spark):
        ref = lm_filter.bigram_counts(_docs(spark, REF))
        out = lm_filter.lm_familiarity(
            _docs(spark, [(0, "the quick the quick the quick")]), ref
        ).first()
        # bigrams: (the,quick)x3 + (quick,the)x2 → 5 total, 3 known
        assert out["n_bigrams"] == 5
        assert out["n_known"] == 3

    def test_hit_cap_bounds_stop_bigrams(self, spark):
        ref = lm_filter.bigram_counts(_docs(
            spark, [(i, "of the " * 50) for i in range(4)]))
        out = lm_filter.lm_familiarity(
            _docs(spark, [(0, "of the")]), ref, hit_cap=7).first()
        assert out["n_known"] == 1 and out["known_hits"] == 7

    def test_filter_keeps_familiar_drops_oov_and_empty(self, spark):
        ref = lm_filter.bigram_counts(_docs(spark, REF))
        docs = _docs(spark, [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "zz yy xx ww vv uu tt"),
            (12, "word"),
        ])
        kept = {r["doc_id"] for r in lm_filter.familiarity_filter(
            docs, ref, min_known_frac=0.5).collect()}
        assert kept == {10}

    def test_deterministic_across_partitionings(self, spark):
        ref = lm_filter.bigram_counts(_docs(spark, REF))
        docs = _docs(spark, [(i, f"the quick brown fox number {i}")
                             for i in range(40)])
        a = sorted(map(repr, lm_filter.lm_familiarity(docs, ref).collect()))
        b = sorted(map(repr, lm_filter.lm_familiarity(
            docs.repartition(7), ref).collect()))
        assert a == b


class TestPMICollocations:
    def _py_pmi(self, texts, min_count, top_n):
        import math
        from collections import Counter

        uni, big = Counter(), Counter()
        total = 0
        for t in texts:
            ws = [w for w in t.lower().split() if w]
            uni.update(ws)
            pairs = list(zip(ws, ws[1:]))
            big.update(" ".join(p) for p in pairs)
            total += len(pairs)
        rows = []
        for bg, cxy in big.items():
            if cxy < min_count:
                continue
            w1, w2 = bg.split(" ")
            ppm = math.floor(float(cxy) * float(total)
                             / (float(uni[w1]) * float(uni[w2]))
                             * 1e6)
            rows.append((bg, cxy, uni[w1], uni[w2], ppm))
        rows.sort(key=lambda r: (-r[4], r[0]))
        return [(i + 1, *r) for i, r in enumerate(rows[:top_n])]

    def test_matches_counter_replica(self, spark):
        import random

        from ragstudio_spark.operators import lm_filter

        rng = random.Random(19)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab) for _ in range(60))
                 for _ in range(40)]
        # seed a strong collocation: 'aa bb' always adjacent
        texts += ["aa bb " * 10 for _ in range(3)]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got = [(r.rank, r.bigram, r.c_xy, r.c1, r.c2, r.pmi_ratio_ppm)
               for r in lm_filter.pmi_collocations(
                   df, min_count=3, top_n=20)
               .orderBy("rank").collect()]
        assert got == self._py_pmi(texts, 3, 20)
        # the seeded collocation dominates the ranking
        assert got[0][1] in ("aa bb", "bb aa")

    def test_min_count_suppresses_hapax(self, spark):
        from ragstudio_spark.operators import lm_filter

        df = spark.createDataFrame(
            [(0, "unique pair here"), (1, "common duo common duo")],
            "doc_id long, text string")
        got = [r.bigram for r in lm_filter.pmi_collocations(
            df, min_count=2, top_n=10).collect()]
        assert "unique pair" not in got
        assert "common duo" in got

    def test_validation(self, spark):
        import pytest

        from ragstudio_spark.operators import lm_filter

        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            lm_filter.pmi_collocations(df, min_count=0)
        with pytest.raises(ValueError):
            lm_filter.pmi_collocations(df, top_n=0)
