"""Composed corpus curation (operators/curation.py)."""

from pyspark.sql import functions as F

from ragstudio_spark.operators import curation


class TestCurateCorpus:
    def test_dedup_redact_pack_composition(self, spark):
        rows = [
            (0, "en", "alpha beta gamma " * 40),
            (1, "en", "alpha beta gamma " * 40),          # exact dup of 0
            (2, "en", "reach me at bob@example.com for details " * 10),
            (3, "fr", "contenu francophone unique " * 30),
            (4, "en", "different english content entirely " * 30),
        ]
        df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
        out = curation.curate_corpus(df, budget=100)
        got = {r["doc_id"]: r for r in out.collect()}

        assert set(got) == {0, 2, 3, 4}          # dup 1 dropped, 0 kept
        assert got[2]["n_email"] == 10
        assert "<EMAIL>" in got[2]["redacted_text"]
        assert got[0]["n_email"] == 0

        # packing: en shard orders by doc_id; doc 0's tokens fill the
        # first sequences, doc 2 starts at cum_before = tok(0)
        t0 = got[0]["token_count"]
        assert got[0]["seq_index"] == 0 and got[0]["seq_token_offset"] == 0
        assert got[2]["seq_index"] == t0 // 100
        assert got[2]["seq_token_offset"] == t0 - (t0 // 100) * 100
        # fr shard independent
        assert got[3]["seq_index"] == 0 and got[3]["seq_token_offset"] == 0

    def test_token_count_follows_redacted_text(self, spark):
        """Redaction changes length; the token estimate must be computed
        on the REDACTED text (what actually ships), not the raw input."""
        df = spark.createDataFrame(
            [(0, "en", "mail a.very.long.address+tag@example-corp.com end")],
            "doc_id int, lang string, text string")
        r = curation.curate_corpus(df).first()
        assert r["token_count"] == len(r["redacted_text"]) // 4
        assert len(r["redacted_text"]) != len(df.first()["text"])

    def test_report_rollup(self, spark):
        rows = [(0, "en", "a@b.io " * 5), (1, "en", "clean " * 200),
                (2, "fr", "propre " * 100)]
        df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
        rep = {r["lang"]: r for r in curation.curation_report(
            curation.curate_corpus(df, budget=50)).collect()}
        assert rep["en"]["n_docs"] == 2 and rep["fr"]["n_docs"] == 1
        assert rep["en"]["n_email"] == 5
        assert rep["en"]["n_sequences"] >= 1
        total = curation.curate_corpus(df, budget=50).agg(
            F.sum("token_count")).first()[0]
        assert rep["en"]["n_tokens"] + rep["fr"]["n_tokens"] == total

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, "en" if i % 3 else "fr",
                 f"document body {i % 4} repeated " * (10 + i % 5))
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
        a = sorted(map(repr, curation.curate_corpus(df).collect()))
        b = sorted(map(repr, curation.curate_corpus(
            df.repartition(7)).collect()))
        assert a == b
