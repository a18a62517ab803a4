"""Query expansion + reranker semantics (reference src/core/rag tier)."""

import pytest

from ragstudio_spark.operators import rag_extras


class TestQueryExpander:
    def test_synonym_expansion_case_preserving(self):
        exp = rag_extras.QueryExpander(
            rag_extras.QueryExpansionConfig(strategy="synonyms", num_queries=3))
        out = exp.expand("What is machine learning")
        # original first, then first-occurrence case-insensitive replacements
        assert out[0] == "What is machine learning"
        assert "define machine learning" in out
        assert len(out) <= 3

    def test_llm_strategies_fall_back_to_synonyms_without_llm(self):
        """Reference __init__ switches LLM strategies to SYNONYMS when no
        LLM is provided (query_expansion.py:119-127) — default-config
        expansion must still produce synonym variants, never just [query]."""
        for strategy in ("multi_query", "llm_generated", "hybrid"):
            exp = rag_extras.QueryExpander(
                rag_extras.QueryExpansionConfig(strategy=strategy))
            assert exp.config.strategy == "synonyms"
            out = exp.expand("What is machine learning?")
            assert out[0] == "What is machine learning?"
            assert any(q.startswith("define ") for q in out), out

    def test_default_config_expands_synonyms_without_llm(self):
        out = rag_extras.QueryExpander().expand("What is machine learning?")
        assert len(out) > 1 and out[0] == "What is machine learning?"

    def test_no_fallback_when_query_has_no_synonyms(self):
        exp = rag_extras.QueryExpander(
            rag_extras.QueryExpansionConfig(strategy="multi_query"))
        assert exp.expand("anything goes here") == ["anything goes here"]

    def test_caller_config_not_mutated(self):
        cfg = rag_extras.QueryExpansionConfig(strategy="multi_query")
        rag_extras.QueryExpander(cfg)
        assert cfg.strategy == "multi_query"

    def test_llm_injection_and_parse(self):
        def fake_llm(_prompt):
            return "1. first version\n2. second version\n3. third version\n4. extra"

        exp = rag_extras.QueryExpander(
            rag_extras.QueryExpansionConfig(strategy="multi_query",
                                            num_queries=3),
            llm=fake_llm)
        out = exp.expand("orig question")
        assert out[0] == "orig question"       # include_original prepends
        assert "first version" in out and "third version" in out
        assert "extra" not in out              # capped at num_queries

    def test_hybrid_dedups_case_insensitive(self):
        def fake_llm(_prompt):
            return "What is Machine Learning\nsomething new"

        exp = rag_extras.QueryExpander(
            rag_extras.QueryExpansionConfig(strategy="hybrid", num_queries=4),
            llm=fake_llm)
        out = exp.expand("what is machine learning")
        lowered = [q.lower() for q in out]
        assert len(lowered) == len(set(lowered))

    def test_empty_and_truncation(self):
        exp = rag_extras.QueryExpander(
            rag_extras.QueryExpansionConfig(strategy="synonyms",
                                            max_query_length=10))
        assert exp.expand("") == [""]
        assert all(len(q) <= 10 for q in exp.expand("x" * 50))

    def test_invalid_strategy(self):
        with pytest.raises(ValueError):
            rag_extras.QueryExpansionConfig(strategy="nope")


class TestExpansionSearch:
    def test_merge_order_and_dedup(self, spark):
        docs = spark.createDataFrame(
            [(0, "machine learning is great"),
             (1, "define the term for beginners"),
             (2, "nothing relevant at all"),
             (3, "machine learning define everything")],
            "doc_id int, text string")
        out = rag_extras.expansion_search(
            docs, "what is machine learning",
            rag_extras.QueryExpander(
                rag_extras.QueryExpansionConfig(strategy="synonyms",
                                                num_queries=3)),
            k_per_query=2, final_k=4).collect()
        by_rank = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert len(by_rank) == len(set(by_rank))   # deduped
        assert set(by_rank) <= {0, 1, 2, 3}
        # docs surfaced by the original query rank before later expansions
        idx = {r["doc_id"]: r["expansion_idx"] for r in out}
        ranks = {r["doc_id"]: r["rank"] for r in out}
        for a in idx:
            for b in idx:
                if idx[a] < idx[b]:
                    assert ranks[a] < ranks[b]


class TestReranker:
    def test_rerank_sort_filter_topk(self, spark):
        docs = spark.createDataFrame(
            [(0, "spark query engine"), (1, "spark"), (2, "unrelated prose"),
             (3, "query spark engine fast")],
            "doc_id int, text string")
        score = rag_extras.lexical_overlap_score("spark query engine")
        out = rag_extras.rerank(
            docs, score,
            rag_extras.RerankerConfig(top_k=2, min_score=0.5)).collect()
        ranked = [(r["doc_id"], r["rerank_score"]) for r in
                  sorted(out, key=lambda r: r["rank"])]
        assert [d for d, _ in ranked] == [0, 3]    # full overlap, id tie-break
        assert all(s >= 0.5 for _, s in ranked)

    def test_cross_encoder_unavailable_raises(self):
        with pytest.raises(ImportError, match="sentence-transformers"):
            rag_extras.load_cross_encoder()


class TestCompressionRetrieve:
    """The 'compression' strategy (reference retrievers.py:105-143):
    EmbeddingsRedundantFilter (greedy, 0.95) then EmbeddingsFilter —
    ground truth below is a hand-computed greedy walk (the non-twin
    check)."""

    def _cands(self, spark):
        q = [1.0, 0.0]
        rows = [
            (1, 1, 11, [1.0, 0.0], q),       # qsim 1.0
            (1, 2, 12, [0.99, 0.14], q),     # cos(c1)=0.990 → redundant
            (1, 3, 13, [0.0, 1.0], q),       # kept by redundancy, qsim 0
            (1, 4, 14, [0.7, 0.7], q),       # cos≈0.707 to both → kept
            (2, 1, 21, [0.6, 0.8], [0.0, 1.0]),  # qsim 0.8
        ]
        return spark.createDataFrame(
            rows, "query_id int, rank int, doc_id int, "
            "embedding array<double>, query_embedding array<double>")

    def test_hand_computed_greedy_pipeline(self, spark):
        from ragstudio_spark.operators import rag_extras

        out = rag_extras.compression_retrieve(
            self._cands(spark), sim_threshold=0.4)
        got = {(r["query_id"], r["doc_id"]): r["rank"]
               for r in out.collect()}
        # q1: 12 dropped as redundant with 11; 13 survives redundancy
        # but fails the similarity filter; 14 survives both
        assert got == {(1, 11): 1, (1, 14): 2, (2, 21): 1}

    def test_redundancy_compares_against_kept_not_dropped(self, spark):
        """A candidate near-dup of a DROPPED (not kept) candidate must
        survive — the greedy filter compares to the kept set only."""
        from ragstudio_spark.operators import rag_extras

        q = [1.0, 0.0]
        rows = [
            (1, 1, 11, [1.0, 0.0], q),
            (1, 2, 12, [0.99, 0.141], q),    # redundant with 11 → drop
            # near-dup of 12 (cos(12,13)≈0.9997 > .95) but cos(11,13)
            # = .985... make it farther from 11: rotate more
            (1, 3, 13, [0.93, 0.368], q),    # cos(11)=0.930 ≤ .95 keep
        ]
        out = rag_extras.compression_retrieve(
            spark.createDataFrame(
                rows, "query_id int, rank int, doc_id int, "
                "embedding array<double>, query_embedding array<double>"),
            sim_threshold=0.0)
        assert [r["doc_id"] for r in out.orderBy("rank").collect()] \
            == [11, 13]

    def test_rank_order_preserved_after_filtering(self, spark):
        from ragstudio_spark.operators import rag_extras

        out = rag_extras.compression_retrieve(
            self._cands(spark), sim_threshold=0.0).orderBy(
                "query_id", "rank")
        q1 = [r["doc_id"] for r in out.collect() if r["query_id"] == 1]
        assert q1 == [11, 13, 14]            # original rank order
