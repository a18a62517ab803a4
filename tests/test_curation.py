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


class TestCuratePretrainStream:
    """curate_pretrain_stream — the composed pretraining manifest."""

    def _docs(self, spark):
        # 3 langs, 2 sources; doc 50 is an exact dup of doc 0;
        # docs 90+ are too short to pass the 20-token gate
        rows = []
        for i in range(90):
            text = " ".join(f"w{(i * 7 + j) % 40}" for j in range(120))
            rows.append((i, text, f"l{i % 3}", f"s{i % 2}"))
        rows.append((50, rows[0][1], rows[0][2], rows[0][3]))  # dup of 0 (id 50)
        rows = [r for r in rows if r[0] != 50 or r[1] == rows[0][1]]
        rows += [(90 + i, "tiny text", f"l{i % 3}", "s0") for i in range(5)]
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string")

    def test_stage_composition(self, spark):
        from ragstudio_spark.operators.curation import curate_pretrain_stream

        docs = self._docs(spark)
        out = curate_pretrain_stream(docs, per_source_cap=1000,
                                     n_buckets=4, budget=256).collect()
        ids = [r.doc_id for r in out]
        # dup: exactly one of {0, 50} survives (the lowest id)
        assert 0 in ids and 50 not in ids
        # gate: short docs dropped
        assert not any(i >= 90 for i in ids)
        # curriculum: schedule positions are the dense prefix
        assert sorted(r.schedule_pos for r in out) == list(range(len(out)))
        # packing: offsets < budget is NOT guaranteed (documents exceed
        # budget), but seq bookkeeping must be internally consistent:
        # offset = cum_before % budget within each shard's schedule order
        by_shard = {}
        for r in sorted(out, key=lambda r: (r.lang, r.schedule_pos)):
            cum = by_shard.get(r.lang, 0)
            assert r.seq_index == cum // 256
            assert r.seq_token_offset == cum - (cum // 256) * 256
            by_shard[r.lang] = cum + r.token_count

    def test_per_source_cap_binds(self, spark):
        from ragstudio_spark.operators.curation import curate_pretrain_stream

        docs = self._docs(spark)
        out = curate_pretrain_stream(docs, per_source_cap=10,
                                     n_buckets=4, budget=256)
        per_source = {r.source: r["count"] for r in
                      out.groupBy("source").count().collect()}
        assert all(v <= 10 for v in per_source.values())

    def test_partition_invariance(self, spark):
        from ragstudio_spark.operators.curation import curate_pretrain_stream

        docs = self._docs(spark)
        a = sorted(tuple(r) for r in curate_pretrain_stream(docs).collect())
        b = sorted(tuple(r) for r in
                   curate_pretrain_stream(docs.repartition(7)).collect())
        assert a == b
