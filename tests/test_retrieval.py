"""Hybrid retrieval operator (BM25 + RRF) semantics and scale-path tests."""

import pytest

from ragstudio_spark.operators import retrieval


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark makes the query engine fast and the table scan faster"),
        (1, "a query against a table"),
        (2, "nothing relevant here at all just filler words and more filler"),
        (3, "spark spark spark query query table fast"),
        (4, "the cat sat on the mat"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.2]),
        (2, [0.0, 1.0]),
        (3, [0.8, 0.1]),
        (4, [0.1, 0.9]),
    ]
    return spark.createDataFrame(rows, "doc_id int, embedding array<float>")


class TestBM25:
    def test_scores_rank_keyword_matches_first(self, spark, corpus):
        scores = {r["doc_id"]: r["bm25_score"]
                  for r in retrieval.bm25_scores(
                      corpus, ["spark", "query", "table"]).collect()}
        assert scores[3] > scores[2]       # term-rich beats filler
        assert scores[0] > scores[2]
        assert scores[4] == 0.0            # no query terms at all

    def test_tf_saturation(self, spark, corpus):
        """k1 saturates term frequency: doc 3's triple 'spark' must not
        score 3x doc 0's single 'spark'."""
        s = {r["doc_id"]: r["bm25_score"]
             for r in retrieval.bm25_scores(corpus, ["spark"]).collect()}
        assert s[3] < 3 * s[0]
        assert s[3] > s[0]


class TestHybrid:
    def test_fusion_blends_modalities(self, spark, corpus, vectors):
        query = vectors.filter("doc_id = 0").select("embedding")
        out = retrieval.hybrid_search(
            corpus, vectors.filter("doc_id <> 0"), ["spark", "query"],
            query, vec_id_col="doc_id",
            config=retrieval.HybridConfig(k=4),
        ).collect()
        ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
        # doc 3: best bm25 AND near-best vector → must fuse to rank 1
        assert ranked[0] == 3

    def test_candidate_limit_matches_full_ranking_for_topk(self, spark, corpus, vectors):
        """The TakeOrderedAndProject candidate path must agree with the
        full-corpus ranking when the limit covers the corpus."""
        query = vectors.filter("doc_id = 0").select("embedding")
        kwargs = dict(vec_id_col="doc_id", config=retrieval.HybridConfig(k=3))
        full = retrieval.hybrid_search(
            corpus, vectors.filter("doc_id <> 0"), ["spark", "query"], query,
            **kwargs).collect()
        limited = retrieval.hybrid_search(
            corpus, vectors.filter("doc_id <> 0"), ["spark", "query"], query,
            candidate_limit=10, **kwargs).collect()
        assert sorted(map(tuple, full)) == sorted(map(tuple, limited))

    def test_config_validation(self):
        with pytest.raises(ValueError):
            retrieval.HybridConfig(vector_weight=1.5)
        with pytest.raises(ValueError):
            retrieval.HybridConfig(bm25_weight=-0.1)


class TestTermEscaping:
    def test_regex_metacharacter_terms_count_literally(self, spark):
        """Regression (ADVICE r2): public-API terms like 'c++' or '3.5'
        must neither throw a pattern error nor mis-count."""
        from ragstudio_spark.operators import retrieval

        docs = spark.createDataFrame(
            [(1, "we write c++ here and c is separate"),
             (2, "version 3.5 beats 3x5 and 345"),
             (3, "plain words only")],
            "doc_id int, text string")
        out = {r["doc_id"]: r["bm25_score"]
               for r in retrieval.bm25_scores(docs, ["c++"]).collect()}
        assert out[1] > 0.0 and out[2] == 0.0 and out[3] == 0.0
        out35 = {r["doc_id"]: r["bm25_score"]
                 for r in retrieval.bm25_scores(docs, ["3.5"]).collect()}
        # '.' escaped: '3x5' and '345' must NOT match
        assert out35[2] > 0.0 and out35[1] == 0.0 and out35[3] == 0.0

    def test_uppercase_terms_score_case_insensitively(self, spark):
        """Regression: tf matches against lowered text — an uppercase term
        must score, not silently return 0 everywhere."""
        from ragstudio_spark.operators import retrieval

        docs = spark.createDataFrame(
            [(1, "Spark rules the cluster"), (2, "nothing relevant")],
            "doc_id int, text string")
        out = {r["doc_id"]: r["bm25_score"]
               for r in retrieval.bm25_scores(docs, ["Spark"]).collect()}
        assert out[1] > 0.0 and out[2] == 0.0


class TestRankedEval:
    def _eval(self, spark, results, qrels, k):
        from ragstudio_spark.operators.retrieval import ranked_eval

        r = spark.createDataFrame(results,
                                  "query_id int, doc_id int, rank int")
        j = spark.createDataFrame(qrels, "query_id int, doc_id int")
        out = ranked_eval(r, j, k=k)
        return {row.query_id: row.asDict() for row in out.collect()}

    def test_hand_computed_metrics(self, spark):
        # q0: rel docs {1, 3, 9}; top-3 ranking hits 3 at rank 2 —
        # rr = 1/2, p@3 = 1/3, recall = 1/3 (doc 9 never retrieved).
        results = [(0, 5, 1), (0, 3, 2), (0, 1, 4)]  # rank 4 > k
        qrels = [(0, 1), (0, 3), (0, 9)]
        got = self._eval(spark, results, qrels, k=3)[0]
        assert got == {"query_id": 0, "n_rel": 3, "n_rel_ret": 1,
                       "first_rel_rank": 2, "rr_ppm": 500000,
                       "p_at_k_ppm": 333333, "recall_ppm": 333333}

    def test_perfect_and_zero_rankings(self, spark):
        results = [(0, 1, 1), (0, 2, 2), (1, 7, 1)]
        qrels = [(0, 1), (0, 2), (1, 8)]
        got = self._eval(spark, results, qrels, k=2)
        assert got[0]["rr_ppm"] == 1000000
        assert got[0]["recall_ppm"] == 1000000
        assert got[1] == {"query_id": 1, "n_rel": 1, "n_rel_ret": 0,
                          "first_rel_rank": None, "rr_ppm": 0,
                          "p_at_k_ppm": 0, "recall_ppm": 0}

    def test_unjudged_query_reports_null_recall(self, spark):
        got = self._eval(spark, [(5, 1, 1)], [(0, 1)], k=2)
        assert got[5]["n_rel"] == 0 and got[5]["recall_ppm"] is None
        assert got[0]["n_rel"] == 1 and got[0]["n_rel_ret"] == 0

    def test_duplicate_judgments_count_once(self, spark):
        got = self._eval(spark, [(0, 1, 1)], [(0, 1), (0, 1)], k=1)
        assert got[0]["n_rel"] == 1 and got[0]["recall_ppm"] == 1000000

    def test_invalid_k_raises(self, spark):
        import pytest

        from ragstudio_spark.operators.retrieval import ranked_eval

        df = spark.createDataFrame([(0, 1, 1)],
                                   "query_id int, doc_id int, rank int")
        with pytest.raises(ValueError):
            ranked_eval(df, df.select("query_id", "doc_id"), k=0)


class TestNdcgEval:
    """ndcg_eval — literal-discount nDCG@k, hand-computed vs math.log2."""

    def _tables(self, spark):
        results = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2), (0, 12, 3),
             (1, 20, 1), (1, 21, 2),
             (2, 30, 1)],
            "query_id int, doc_id int, rank int")
        qrels = spark.createDataFrame(
            [(0, 11), (0, 12), (0, 99),   # q0: hits at ranks 2,3 of 3 rel
             (1, 20),                     # q1: perfect single
             (3, 77)],                    # q3: judged, never retrieved
            "query_id int, doc_id int")
        return results, qrels

    def test_hand_computed(self, spark):
        import math

        from ragstudio_spark.operators.retrieval import ndcg_eval

        results, qrels = self._tables(spark)
        got = {r.query_id: (r.n_rel, r.n_rel_ret, r.ndcg_ppm)
               for r in ndcg_eval(results, qrels, k=10).collect()}
        d = lambda i: 1.0 / math.log2(i + 1)
        ideal3 = d(1) + d(2) + d(3)
        exp0 = math.floor(1_000_000 * (d(2) + d(3)) / ideal3)
        assert got[0] == (3, 2, exp0)
        assert got[1] == (1, 1, 1_000_000)   # perfect ranking
        assert got[3] == (1, 0, 0)           # judged, nothing retrieved
        # results-only query surfaces with n_rel=0 and NULL ndcg (the
        # ranked_eval full-outer contract; review-found)
        assert got[2] == (0, 0, None)

    def test_rank_order_matters(self, spark):
        from ragstudio_spark.operators.retrieval import ndcg_eval

        qrels = spark.createDataFrame([(0, 1)], "query_id int, doc_id int")
        top = spark.createDataFrame([(0, 1, 1), (0, 2, 2)],
                                    "query_id int, doc_id int, rank int")
        bottom = spark.createDataFrame([(0, 2, 1), (0, 1, 2)],
                                       "query_id int, doc_id int, rank int")
        [a] = ndcg_eval(top, qrels, k=5).collect()
        [b] = ndcg_eval(bottom, qrels, k=5).collect()
        assert a.ndcg_ppm == 1_000_000 and b.ndcg_ppm < a.ndcg_ppm

    def test_partition_invariance(self, spark):
        from ragstudio_spark.operators.retrieval import ndcg_eval

        results, qrels = self._tables(spark)
        a = [tuple(r) for r in ndcg_eval(results, qrels).collect()]
        b = [tuple(r) for r in
             ndcg_eval(results.repartition(7), qrels.repartition(5)).collect()]
        assert a == b
