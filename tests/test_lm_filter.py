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
