"""Chunker kernel tests — port of the reference's chunking invariants
(tests/unit/test_langchain_chunker.py:114-308, test_chunker.py:17-120)."""

from ragstudio_spark.kernel import chunk as kchunk
from ragstudio_spark.kernel import splitter


LONG_TEXT = "This is a sentence. " * 500  # ~10k chars, repetitive
VARIED_TEXT = " ".join(
    f"Sentence number {i} describes the topic of item {i} in detail."
    for i in range(300)
)  # ~10k chars, all sentences distinct
FRENCH = (
    "La Peugeot 208 2024 propose un moteur hybride 48V, une version électrique "
    "et de nouveaux systèmes d'aide à la conduite. "
) * 40


class TestRecursiveSplit:
    def test_empty(self):
        assert splitter.recursive_split("") == []

    def test_single_word(self):
        assert splitter.recursive_split("Bonjour") == ["Bonjour"]

    def test_chunk_size_budget(self):
        chunks = splitter.recursive_split(LONG_TEXT, max_tokens=100, overlap=10)
        assert len(chunks) > 1
        assert all(len(c) <= 400 for c in chunks)

    def test_no_mid_word_breaks(self):
        # reference test_langchain_chunker.py:140-159 — if a chunk ends with
        # a letter, the next chunk must begin with space/newline/non-alpha
        # (i.e. the cut fell on a word boundary, not inside a word).
        chunks = splitter.recursive_split(LONG_TEXT, max_tokens=100, overlap=10)
        for a, b in zip(chunks, chunks[1:]):
            if a and a[-1].isalpha() and b:
                assert b[0] in (" ", "\n") or not b[0].isalpha(), (
                    f"word broken between '{a[-20:]}' and '{b[:20]}'"
                )

    def test_no_duplicates(self):
        # reference test_langchain_chunker.py:161-169 (on varied text)
        chunks = splitter.recursive_split(VARIED_TEXT, max_tokens=100, overlap=10)
        assert len(chunks) > 1
        assert len(set(chunks)) == len(chunks)

    def test_overlap_continuity(self):
        # reference test_langchain_chunker.py:171-194 — one of the last-3
        # words (len>3) of chunk i appears in the head of chunk i+1.
        chunks = splitter.recursive_split(VARIED_TEXT, max_tokens=100, overlap=25)
        assert len(chunks) > 1
        for a, b in zip(chunks, chunks[1:]):
            end_words = [w for w in a[-40:].strip().split()[-3:] if len(w) > 3]
            start_text = b[:80].strip()
            assert any(w in start_text for w in end_words)

    def test_accents_preserved(self):
        text = "Texte avec accents: é è ê à ù. Caractères spéciaux: « » © ®."
        chunks = splitter.recursive_split(text, max_tokens=400, overlap=50)
        assert chunks == [text]

    def test_separator_priority_paragraphs_first(self):
        text = "para one is here\n\npara two is here\n\npara three is here"
        chunks = splitter.recursive_split(text, max_tokens=5, overlap=0)
        assert any("para one" in c for c in chunks)
        # paragraph boundaries respected: no chunk spans two paragraphs
        assert all("\n\n" not in c for c in chunks)

    def test_unbreakable_token(self):
        # a single 1000-char token falls through to char-level splitting:
        # every chunk fits the budget and the text is fully covered
        text = "x" * 1000
        chunks = splitter.recursive_split(text, max_tokens=50, overlap=5)
        assert all(len(c) <= 200 for c in chunks)
        assert sum(len(c) for c in chunks) >= len(text)
        assert all(c in text for c in chunks)


class TestWindowSplit:
    def test_empty(self):
        assert splitter.window_split("") == []

    def test_window_counts(self):
        # reference test_chunker.py: 200 chars at window 50*4=200? use chars:
        # max_tokens=50, overlap=10 → window 200, step 160
        text = "a" * 200
        chunks = splitter.window_split(text, max_tokens=50, overlap=10)
        assert chunks[0] == text
        text = "b" * 400
        chunks = splitter.window_split(text, max_tokens=50, overlap=0)
        assert len(chunks) == 2 and all(len(c) == 200 for c in chunks)

    def test_step_floor_one(self):
        chunks = splitter.window_split("abcd", max_tokens=1, overlap=5)
        assert len(chunks) == 4  # step clamps to 1


class TestParentChild:
    MD = (
        "# Title\n\nintro text here\n\n## Section A\n\n" + "alpha content. " * 60
        + "\n\n## Section B\n\n" + "beta content. " * 60
    )

    def test_heading_context_prepended(self):
        chunks = splitter.parent_child_split(self.MD, max_tokens=50, overlap=5)
        assert any(c.startswith("## Section A") for c in chunks)
        assert any(c.startswith("## Section B") for c in chunks)

    def test_no_structure_falls_back(self):
        text = "plain sentence without structure. " * 50
        assert splitter.parent_child_split(text, 50, 5) == splitter.window_split(text, 50, 5)

    def test_split_by_headings_patterns(self):
        text = "1. Intro\nbody a\nII. Part\nbody b\nALL CAPS HEADER\nbody c"
        sections = splitter.split_by_headings(text)
        headings = [h for h, _ in sections]
        assert "1. Intro" in headings
        assert "II. Part" in headings
        assert "ALL CAPS HEADER" in headings


class TestChunkTurn:
    def test_empty_text(self):
        chunks, stats = kchunk.chunk_turn("", "conv_0:0")
        assert chunks == []

    def test_metadata_completeness_and_spans(self):
        # reference test_langchain_chunker.py:114-138
        chunks, stats = kchunk.chunk_turn(LONG_TEXT, "conv_0:0", max_tokens=100, overlap=10)
        assert len(chunks) > 1
        prev_end = 0
        for i, c in enumerate(chunks):
            assert c["chunk_index"] == i
            assert c["char_end"] > c["char_start"] >= 0
            assert c["char_length"] == len(c["text"])
            assert c["token_count"] == len(c["text"]) // 4
            assert c["total_chunks"] == len(chunks)
            assert c["chunk_id"].startswith("chunk_")
            assert c["char_start"] >= 0
            prev_end = c["char_end"]

    def test_span_find_from_position(self):
        # on varied text every chunk slices back exactly from its span
        chunks, _ = kchunk.chunk_turn(VARIED_TEXT, "c:1", max_tokens=50, overlap=10)
        import ragstudio_spark.kernel.textops as t
        pre, _ = t.preprocess(VARIED_TEXT)
        assert len(chunks) > 2
        for c in chunks:
            assert pre[c["char_start"]:c["char_end"]] == c["text"]

    def test_span_quirk_on_repeated_prefixes(self):
        # the reference's find-from-position rule (langchain_chunker.py:
        # 224-231) can land early when 50-char prefixes repeat; the contract
        # is the *rule*, not slice-back equality. Spans must still be
        # monotone and length-consistent.
        text = "Sentence one is here. " * 100
        chunks, _ = kchunk.chunk_turn(text, "c:1", max_tokens=50, overlap=10)
        prev_start = -1
        for c in chunks:
            assert c["char_end"] - c["char_start"] == c["char_length"]
            assert c["char_start"] >= prev_start
            prev_start = c["char_start"]

    def test_deterministic_ids(self):
        a, _ = kchunk.chunk_turn(LONG_TEXT, "conv_9:3", max_tokens=100, overlap=10)
        b, _ = kchunk.chunk_turn(LONG_TEXT, "conv_9:3", max_tokens=100, overlap=10)
        assert [c["chunk_id"] for c in a] == [c["chunk_id"] for c in b]
        c, _ = kchunk.chunk_turn(LONG_TEXT, "conv_9:4", max_tokens=100, overlap=10)
        assert a[0]["chunk_id"] != c[0]["chunk_id"]

    def test_strategy_mapping(self):
        chunks, _ = kchunk.chunk_turn(LONG_TEXT, "c:0", requested_strategy="semantic")
        assert chunks[0]["chunking_strategy"] == "recursive"
        assert chunks[0]["requested_strategy"] == "semantic"
        chunks, _ = kchunk.chunk_turn(LONG_TEXT, "c:0", requested_strategy="late")
        assert chunks[0]["chunking_strategy"] == "token"

    def test_preprocess_applied(self):
        text = "Cela apermis de tester. " * 30
        chunks, stats = kchunk.chunk_turn(text, "c:0")
        assert stats["extraction_fixes"] == 30
        assert "a permis" in chunks[0]["text"]

    def test_adaptive_parent_child(self):
        md = TestParentChild.MD
        chunks, _ = kchunk.chunk_turn(
            md, "c:0", requested_strategy="parent_child", max_tokens=50,
            overlap=5, adaptive=True, do_preprocess=False,
        )
        assert any(c["text"].startswith("## Section A") for c in chunks)

    def test_one_word(self):
        chunks, _ = kchunk.chunk_turn("Bonjour", "c:0")
        assert len(chunks) == 1 and chunks[0]["text"] == "Bonjour"

    def test_validate_chunks(self):
        issues = kchunk.validate_chunks(["short", "short"])
        assert any("Duplicate" in i for i in issues)
        assert any("< 50 chars" in i for i in issues)
