"""RAG answer assembly (operators/rag_chain.py) vs the reference chain's
deterministic parts (chain.py:28-36, 183-228) — format parity is pinned
against an independent Python replica of the reference algorithm (the
non-twin check CLAUDE.md invariant 6 requires), plus multi-query fusion
(rag_extras.multi_query_search) vs a hand-computed union."""

from pyspark.sql import functions as F

from ragstudio_spark.operators import rag_chain, rag_extras


def _hits(spark):
    return spark.createDataFrame(
        [(1, 1, "alpha " * 10, "a.pdf", 2),          # 60 chars → 15 tok
         (1, 2, "beta " * 40, "b.pdf", None),        # 200 chars → 50 tok
         (1, 3, "gamma\ngamma", "c.pdf", 1),         # 11 chars → 2 tok
         (1, 4, "delta " * 50, "d.pdf", 3),          # 300 chars → 75 tok
         (1, 5, "omitted by k", "e.pdf", 9),
         (2, 1, "solo " * 600, None, 4)],            # 3000 chars → 750 tok
        "query_id int, rank int, text string, source_name string, "
        "page int")


class TestAssembleContext:
    def test_budget_prefix_and_separator(self, spark):
        out = {r["query_id"]: r for r in rag_chain.assemble_context(
            _hits(spark), k=4, token_budget=70).collect()}
        q1 = out[1]
        # 15 + 50 = 65 ≤ 70; +2 would need cum 67 ≤ 70 BUT cum runs over
        # the full prefix: rank3 cum = 67 ≤ 70 → kept; rank4 cum 142 → no
        assert q1["n_sources"] == 3 and q1["context_tokens"] == 67
        assert q1["context"] == ("alpha " * 10 + "\n\n" + "beta " * 40
                                 + "\n\n" + "gamma\ngamma")

    def test_cumulative_bound_is_contiguous(self, spark):
        """Once the running prefix exceeds the budget, later small
        chunks stay out — citations are a prefix of the rank order,
        never a subset with holes."""
        out = {r["query_id"]: r for r in rag_chain.assemble_context(
            _hits(spark), k=4, token_budget=40).collect()}
        # rank1 (15) fits; rank2 puts cum at 65 > 40; rank3 alone would
        # fit (2 tok) but cum=67 keeps it out
        assert out[1]["n_sources"] == 1
        assert out[1]["context"] == "alpha " * 10

    def test_top_source_survives_any_budget(self, spark):
        out = {r["query_id"]: r for r in rag_chain.assemble_context(
            _hits(spark), k=4, token_budget=10).collect()}
        assert out[2]["n_sources"] == 1          # 750 tok ≫ 10, kept
        assert out[2]["context_tokens"] == 750

    def test_k_caps_before_budget(self, spark):
        out = {r["query_id"]: r for r in rag_chain.assemble_context(
            _hits(spark), k=2, token_budget=10_000).collect()}
        assert out[1]["n_sources"] == 2          # ranks 3-5 cut by k

    def test_prompt_template_substitution(self, spark):
        df = spark.createDataFrame([("CTX", "Q?")], "c string, q string")
        got = df.select(rag_chain.rag_prompt(
            F.col("c"), F.col("q")).alias("p")).first()["p"]
        assert got == rag_chain.DEFAULT_RAG_PROMPT.format(
            context="CTX", question="Q?")


def _reference_format_answer(result: dict) -> str:
    """Independent replica of chain.py:183-228 (the deterministic
    algorithm, transcribed from the reference listing)."""
    output = []
    output.append("=" * 80)
    output.append("RÉPONSE")
    output.append("=" * 80)
    output.append(result["result"])
    output.append("")
    if result.get("source_documents"):
        output.append("=" * 80)
        output.append("SOURCES")
        output.append("=" * 80)
        for i, doc in enumerate(result["source_documents"], 1):
            filename = doc["metadata"].get("source_name", "Unknown")
            page = doc["metadata"].get("page", "N/A")
            output.append(f"\n[{i}] {filename} (page {page})")
            preview = doc["page_content"][:200].replace("\n", " ")
            output.append(f"    {preview}...")
    output.append("")
    output.append("=" * 80)
    output.append("STATISTIQUES")
    output.append("=" * 80)
    output.append(f"Retrieval time: {result['retrieval_time']}s")
    output.append(f"Generation time: {result['generation_time']}s")
    output.append(f"Total time: {result['total_time']}s")
    output.append(f"Sources used: {result['num_sources']}")
    return "\n".join(output)


class TestFormatAnswer:
    def _spark_format(self, spark, docs, answer="La réponse."):
        cits = (rag_chain.citations(_hits(spark), k=4)
                .filter(F.col("query_id") == 1)
                .groupBy("query_id")
                .agg(F.array_sort(F.collect_list(F.struct(
                    "rank", "line", "preview"))).alias("srcs")))
        row = cits.select(rag_chain.format_answer_col(
            F.lit(answer),
            F.expr("transform(srcs, s -> struct(s.line, s.preview))"),
            F.lit("0.12"), F.lit("0.34"), F.lit("0.46"),
            F.size("srcs")).alias("fmt")).first()
        return row["fmt"]

    def test_matches_reference_algorithm_with_sources(self, spark):
        docs = [
            {"metadata": {"source_name": "a.pdf", "page": 2},
             "page_content": "alpha " * 10},
            {"metadata": {"source_name": "b.pdf"},
             "page_content": "beta " * 40},
            {"metadata": {"source_name": "c.pdf", "page": 1},
             "page_content": "gamma\ngamma"},
            {"metadata": {"source_name": "d.pdf", "page": 3},
             "page_content": "delta " * 50},
        ]
        expected = _reference_format_answer({
            "result": "La réponse.", "source_documents": docs,
            "retrieval_time": 0.12, "generation_time": 0.34,
            "total_time": 0.46, "num_sources": 4})
        assert self._spark_format(spark, docs) == expected

    def test_matches_reference_algorithm_without_sources(self, spark):
        expected = _reference_format_answer({
            "result": "Je ne sais pas.", "source_documents": [],
            "retrieval_time": 0.12, "generation_time": 0.34,
            "total_time": 0.46, "num_sources": 0})
        df = spark.createDataFrame([(1,)], "query_id int")
        got = df.select(rag_chain.format_answer_col(
            F.lit("Je ne sais pas."),
            F.expr("CAST(array() AS array<struct<line:string,"
                   "preview:string>>)"),
            F.lit("0.12"), F.lit("0.34"), F.lit("0.46"),
            F.lit(0)).alias("fmt")).first()["fmt"]
        assert got == expected

    def test_preview_truncates_at_200_and_flattens_newlines(self, spark):
        long_text = ("line one\nline two " * 30)     # > 200 chars
        hits = spark.createDataFrame(
            [(1, 1, long_text, "x.pdf", 7)],
            "query_id int, rank int, text string, source_name string, "
            "page int")
        row = rag_chain.citations(hits, k=1).first()
        assert row["preview"] == \
            long_text[:200].replace("\n", " ") + "..."
        # NB reference truncates THEN flattens; with \n inside the first
        # 200 chars the two orders agree (replace is 1:1 on length)


class TestMultiQueryFused:
    def test_hand_computed_union(self, spark):
        """3 docs engineered so doc 10 tops list A only, doc 20 tops
        list B only, doc 30 appears in both → fused RRF must put the
        twice-surfaced doc first (the point of fusion vs first-
        appearance order)."""
        docs = spark.createDataFrame(
            [(10, "spark spark spark spark infrastructure"),
             (20, "query query query query infrastructure"),
             (30, "spark query spark query infrastructure"),
             (40, "nothing relevant here at all"),
             (50, "spark alone once"),
             (60, "query alone once")],
            "doc_id int, text string")

        class TwoLists:
            def expand(self, q):
                return ["spark", "query"]

        out = rag_extras.multi_query_search(
            docs, "ignored", TwoLists(), k_per_query=3, final_k=10)
        rows = {r["doc_id"]: r for r in out.collect()}
        # per-expansion BM25 top-3: 'spark' → [10, 30, 50],
        # 'query' → [20, 30, 60]; doc 30 in both lists
        assert rows[30]["n_lists"] == 2
        assert rows[30]["rank"] == 1
        scale = rag_extras.RRF_SCALE
        assert rows[30]["fused_score"] == scale // 62 + scale // 62
        assert rows[10]["fused_score"] == scale // 61  # rank-1, one list
        assert 40 not in rows

    def test_single_expansion_equals_bm25_topk(self, spark):
        docs = spark.createDataFrame(
            [(i, "term " * (5 - i % 5) + f"filler {i}") for i in range(20)],
            "doc_id int, text string")

        class One:
            def expand(self, q):
                return ["term"]

        out = rag_extras.multi_query_search(
            docs, "ignored", One(), k_per_query=5, final_k=5).collect()
        assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] \
            == [0, 5, 10, 15, 1]
        assert all(r["n_lists"] == 1 for r in out)
