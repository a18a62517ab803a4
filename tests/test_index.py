"""Positional inverted index + phrase search (operators/index.py).

Hand-computed fixtures (the non-twin check for this operator): every
expected count below is derived by eye from the literal strings, so a
shared Spark/DuckDB misunderstanding cannot hash green here.
"""

import pytest
from pyspark.sql import functions as F

from ragstudio_spark.operators.index import (
    phrase_search, positional_postings, read_postings, write_postings)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1: two occurrences of "big red fox", one of "red fox"
        (1, "the big red fox saw a big red fox today"),
        # doc 2: one occurrence, capitalised + extra whitespace
        (2, "A Big  Red   Fox sleeps"),
        # doc 3: words present but never adjacent
        (3, "big dog red car fox trap"),
        # doc 4: overlapping repeated-word phrase material
        (4, "ha ha ha ha"),
        # doc 5: empty text
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestPostings:
    def test_positions_and_lowering(self, docs):
        got = {(r.doc_id, r.term, r.pos)
               for r in positional_postings(docs).collect()
               if r.doc_id == 2}
        assert got == {(2, "a", 0), (2, "big", 1), (2, "red", 2),
                       (2, "fox", 3), (2, "sleeps", 4)}

    def test_empty_text_yields_no_postings(self, docs):
        assert positional_postings(docs).filter("doc_id = 5").count() == 0


class TestPhraseSearch:
    def test_hand_computed_counts(self, docs):
        got = {(r.doc_id, r.n_occurrences)
               for r in phrase_search(docs, ["big", "red", "fox"]).collect()}
        assert got == {(1, 2), (2, 1)}

    def test_rank_order_ties_on_doc_id(self, docs):
        rows = phrase_search(docs, ["Big", "Red", "Fox"]).collect()
        assert [(r.rank, r.doc_id) for r in rows] == [(1, 1), (2, 2)]

    def test_non_adjacent_terms_do_not_match(self, docs):
        ids = {r.doc_id for r in phrase_search(docs, ["red", "car", "trap"]).collect()}
        assert ids == set()  # 'red car' adjacent but 'trap' is not next

    def test_repeated_word_phrase_overlapping(self, docs):
        # "ha ha" in "ha ha ha ha" → anchors 0,1,2 → 3 occurrences
        got = {(r.doc_id, r.n_occurrences)
               for r in phrase_search(docs, ["ha", "ha"]).collect()}
        assert got == {(4, 3)}

    def test_single_term_phrase_is_tf(self, docs):
        got = {(r.doc_id, r.n_occurrences)
               for r in phrase_search(docs, ["big"]).collect()}
        assert got == {(1, 2), (2, 1), (3, 1)}

    def test_empty_phrase_raises(self, docs):
        with pytest.raises(ValueError):
            phrase_search(docs, [])

    def test_parallelism_invariance(self, docs):
        a = phrase_search(docs, ["big", "red", "fox"]).collect()
        b = phrase_search(docs.repartition(7), ["big", "red", "fox"]).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestPersistedIndex:
    def test_roundtrip_and_pruned_query(self, spark, docs, tmp_path):
        path = str(tmp_path / "postings")
        write_postings(docs, path, n_buckets=8)
        post = read_postings(spark, path, ["big", "red", "fox"])
        # pushed IN-filter reaches the scan
        plan = post._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "In(term" in plan
        got = {(r.doc_id, r.n_occurrences)
               for r in phrase_search(
                   post.select("doc_id", "term", "pos"),
                   ["big", "red", "fox"], postings=True).collect()}
        assert got == {(1, 2), (2, 1)}


class TestTermsSearch:
    def test_and_semantics(self, docs):
        from ragstudio_spark.operators.index import terms_search

        got = {(r.doc_id, r.n_matched_terms, r.total_tf)
               for r in terms_search(docs, ["big", "fox"]).collect()}
        # doc1: big x2 + fox x2 = 4; doc2: 1+1; doc3: 1+1
        assert got == {(1, 2, 4), (2, 2, 2), (3, 2, 2)}

    def test_or_semantics_and_rank(self, docs):
        from ragstudio_spark.operators.index import terms_search

        rows = terms_search(docs, ["sleeps", "trap"],
                            require_all=False).collect()
        assert [(r.rank, r.doc_id) for r in rows] == [(1, 2), (2, 3)]

    def test_duplicate_query_terms_collapse(self, docs):
        from ragstudio_spark.operators.index import terms_search

        a = [tuple(r) for r in terms_search(docs, ["big", "big"]).collect()]
        b = [tuple(r) for r in terms_search(docs, ["big"]).collect()]
        assert a == b

    def test_empty_terms_raise(self, docs):
        import pytest as _pytest

        from ragstudio_spark.operators.index import terms_search

        with _pytest.raises(ValueError):
            terms_search(docs, [])
