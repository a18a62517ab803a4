"""BPE token splitter (kernel/bpe.py) — the reference's primary token path
(src/core/chunk/chunker.py:58-73) without tiktoken."""

import pytest

from ragstudio_spark.kernel import bpe


class TestTokenizer:
    def test_merges_apply_by_rank(self):
        tok = bpe.BPETokenizer()
        # embedded table: t+h -> th (rank 0), th+e -> the (rank 1)
        assert tok._bpe("the") == ("the",)
        assert tok._bpe("thx") == ("th", "x")
        assert tok._bpe("zq") == ("z", "q")

    def test_boundaries_cover_text_exactly(self):
        tok = bpe.BPETokenizer()
        for text in ("the thin antelope ingested another thing",
                     "l'équipe française gère les données!",
                     "a", "", "  spaced   out  ", "mixé: 汉字 and €uro"):
            b = tok.token_boundaries(text)
            assert b[0] == 0 and b[-1] == len(text)
            assert b == sorted(b)
            # token concatenation is the identity (lossless decode)
            assert "".join(text[b[i]:b[i + 1]] for i in range(len(b) - 1)) == text

    def test_tokens_never_cross_pretoken_boundaries(self):
        tok = bpe.BPETokenizer()
        b = tok.token_boundaries("the cat")
        toks = ["the cat"[b[i]:b[i + 1]] for i in range(len(b) - 1)]
        assert "the" in toks  # merged within the word
        assert all(" c" == t or " " not in t or t.startswith(" ")
                   for t in toks)

    def test_load_merges_file(self, tmp_path):
        p = tmp_path / "merges.txt"
        p.write_text("#version: test\na b\nab c\n")
        tok = bpe.load_merges(str(p))
        assert tok._bpe("abc") == ("abc",)
        assert tok._bpe("acb") == ("a", "c", "b")
        bad = tmp_path / "bad.txt"
        bad.write_text("a b c\n")
        with pytest.raises(ValueError, match="bad merges line"):
            bpe.load_merges(str(bad))


class TestBpeSplit:
    def test_window_and_step_match_reference_loop(self):
        tok = bpe.BPETokenizer([])  # no merges: 1 token per char/pretoken
        text = "abcdefgh"
        b = tok.token_boundaries(text)
        n = len(b) - 1
        chunks = bpe.bpe_split(text, max_tokens=4, overlap=1, tokenizer=tok)
        # reference: range(0, n_tokens, step=max_tokens-overlap)
        step = 3
        assert len(chunks) == len(range(0, n, step))
        assert chunks[0] == text[b[0]:b[4]]
        assert chunks[1] == text[b[3]:b[7]]

    def test_chunks_are_substrings_with_token_overlap(self):
        text = "the thin antelope ingested another thing entirely today. " * 30
        chunks = bpe.bpe_split(text, max_tokens=20, overlap=5)
        assert len(chunks) > 2
        pos = 0
        for c in chunks:
            p = text.find(c, max(0, pos - len(c)))
            assert p != -1, "chunk must be a verbatim substring"
            pos = p + 1

    def test_empty_input(self):
        assert bpe.bpe_split("", 10, 2) == []


class TestPipelineIntegration:
    def test_pipeline_bpe_token_strategy(self, spark, tmp_path):
        """token strategy + merges file: chunks differ from the char-window
        fallback and remain verbatim substrings of the preprocessed text
        (the spans-only wire transfer still applies)."""
        from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline

        merges = tmp_path / "merges.txt"
        merges.write_text("\n".join(f"{a} {b}" for a, b in bpe.EMBEDDED_MERGES))
        text = ("the antelope ingested another thing entirely. " * 120)
        df = spark.createDataFrame(
            [("c1", 0, text, None, None)],
            "conv_id string, turn_idx int, text string, tool string, ts timestamp")
        base_cfg = dict(strategy="token", min_readable_ratio=0.0)
        # bpe_merges_path=None = explicit char-window fallback (the
        # config DEFAULT is now "auto" = the shipped trained vocabulary)
        fallback = run_pipeline(df, PipelineConfig(
            **base_cfg, bpe_merges_path=None)).chunks.collect()
        tokenized = run_pipeline(df, PipelineConfig(
            **base_cfg, bpe_merges_path=str(merges))).chunks.collect()
        assert len(tokenized) > 0
        assert ([r["text"] for r in fallback]
                != [r["text"] for r in tokenized])
        for r in tokenized:
            assert r["text"] in text


class TestShippedVocabulary:
    """The trained artifact (ragstudio_spark/data/merges.txt, produced by
    scripts/train_bpe.py) and its "auto" resolution contract."""

    def test_artifact_loads_and_is_converged(self):
        tok = bpe.default_tokenizer()
        assert tok is not None
        assert len(tok.ranks) > 100      # trained-to-convergence vocabulary
        # trained merges include whitespace-bearing tokens (space-prefixed
        # pieces dominate under the GPT-2-style pre-tokenizer) — the
        # escaping contract is load-bearing for the shipped file
        assert any(" " in a or " " in b for a, b in tok.ranks)

    def test_resolve_tokenizer_contract(self, tmp_path):
        assert bpe.resolve_tokenizer("auto") is bpe.default_tokenizer()
        assert bpe.resolve_tokenizer(None) is None
        assert bpe.resolve_tokenizer("none") is None
        assert bpe.resolve_tokenizer("window") is None
        p = tmp_path / "m.txt"
        p.write_text("a b\n")
        assert bpe.resolve_tokenizer(str(p)).ranks == {("a", "b"): 0}

    def test_trained_vocab_compresses_better_than_fallback(self):
        """tokens-per-word on corpus-flavored text: the trained vocabulary
        must beat the 26-merge embedded fallback by a wide margin (the
        improvement the artifact exists to deliver — it trained to full
        convergence on the synthetic word pool, so common words become
        single tokens)."""
        sample = ("the table scan joins query windows while batch streams "
                  "sort values by key and merge partitioned rows fast")
        trained = bpe.default_tokenizer()
        fallback = bpe.BPETokenizer()
        t, f = trained.encode_len(sample), fallback.encode_len(sample)
        assert t < 0.6 * f, (t, f)
        # boundaries stay a lossless cover under the trained vocab too
        b = trained.token_boundaries(sample)
        assert b[0] == 0 and b[-1] == len(sample) and b == sorted(b)

    def test_pipeline_default_uses_trained_vocab(self, spark):
        """token strategy with DEFAULT config must produce different
        chunks than the explicit char-window opt-out — proof the "auto"
        default actually reaches the fused hop."""
        from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline

        text = ("the antelope ingested another thing entirely. " * 120)
        df = spark.createDataFrame(
            [("c1", 0, text, None, None)],
            "conv_id string, turn_idx int, text string, tool string, "
            "ts timestamp")
        base = dict(strategy="token", min_readable_ratio=0.0)
        auto = run_pipeline(df, PipelineConfig(**base)).chunks.collect()
        window = run_pipeline(df, PipelineConfig(
            **base, bpe_merges_path=None)).chunks.collect()
        assert auto and window
        assert ([r["text"] for r in auto] != [r["text"] for r in window])
        for r in auto:
            assert r["text"] in text


class TestBpeProperties:
    def test_boundary_invariants_hold_on_arbitrary_text(self):
        """Property: for ANY text, token boundaries are a strictly
        increasing cover of [0, len] and splitting at them is lossless."""
        from hypothesis import given, settings, strategies as st

        tok = bpe.BPETokenizer()

        @settings(max_examples=200, deadline=None)
        @given(st.text(max_size=300))
        def check(text):
            b = tok.token_boundaries(text)
            assert b[0] == 0 and b[-1] == len(text)
            assert all(b[i] < b[i + 1] for i in range(len(b) - 1))
            assert "".join(text[b[i]:b[i + 1]]
                           for i in range(len(b) - 1)) == text

        check()

    def test_split_windows_cover_text_for_any_params(self):
        from hypothesis import given, settings, strategies as st

        tok = bpe.BPETokenizer()

        @settings(max_examples=100, deadline=None)
        @given(st.text(min_size=1, max_size=200),
               st.integers(min_value=1, max_value=20),
               st.integers(min_value=0, max_value=19))
        def check(text, max_tokens, overlap):
            chunks = bpe.bpe_split(text, max_tokens, overlap, tokenizer=tok)
            # first chunk starts the text; every char is covered by the
            # union of chunks (step <= max_tokens guarantees no gaps)
            if overlap < max_tokens:
                assert chunks and text.startswith(chunks[0])
                assert sum(len(c) for c in chunks) >= len(text)

        check()
