"""Property-based (hypothesis) invariants for the splitter/chunk kernel.

The reference has no property tests (SURVEY §5); these pin the algebraic
invariants that the example-based suite can't sweep: budget compliance,
coverage, span consistency, determinism, and strip semantics over
adversarial unicode text.
"""

from hypothesis import given, settings, strategies as st

from ragstudio_spark.kernel import chunk as kchunk
from ragstudio_spark.kernel import splitter, textops

# text with the separators the splitter cares about + unicode + artifacts
_text = st.lists(
    st.sampled_from(
        list("abcdefgh é.!?;,#|=- \n\t") + ["\n\n", ". ", "! ", "? ", "; ", ", "]
    ),
    min_size=0, max_size=1500,
).map("".join)
_budget = st.integers(min_value=2, max_value=120)


class TestRecursiveSplitProperties:
    @given(text=_text, max_tokens=_budget)
    @settings(max_examples=150, deadline=None)
    def test_budget_and_strip(self, text, max_tokens):
        overlap = max_tokens // 4
        chunks = splitter.recursive_split(text, max_tokens=max_tokens, overlap=overlap)
        for c in chunks:
            assert c == c.strip()
            assert c != ""
            # budget holds except for a single unbreakable run longer than
            # the budget (then the chunk is exactly that run's char split)
            assert len(c) <= max_tokens * 4 or " " not in c

    @given(text=_text, max_tokens=_budget)
    @settings(max_examples=150, deadline=None)
    def test_content_coverage(self, text, max_tokens):
        """Every non-whitespace char of the input appears in the output
        (chunking never loses content, only whitespace at chunk edges)."""
        chunks = splitter.recursive_split(text, max_tokens=max_tokens, overlap=0)
        joined = "".join(chunks)
        for ch in set(text):
            if not ch.isspace():
                assert text.count(ch) <= joined.count(ch) + 0  # no loss
                assert joined.count(ch) >= text.count(ch)

    @given(text=_text, max_tokens=_budget)
    @settings(max_examples=100, deadline=None)
    def test_deterministic(self, text, max_tokens):
        a = splitter.recursive_split(text, max_tokens=max_tokens, overlap=5)
        b = splitter.recursive_split(text, max_tokens=max_tokens, overlap=5)
        assert a == b

    @given(text=_text, max_tokens=_budget)
    @settings(max_examples=100, deadline=None)
    def test_in_order_substrings(self, text, max_tokens):
        """Chunks appear in input order: each chunk is findable at or after
        the position where the previous chunk started."""
        chunks = splitter.recursive_split(text, max_tokens=max_tokens, overlap=0)
        pos = 0
        for c in chunks:
            found = text.find(c, pos)
            assert found >= 0, f"chunk not in input: {c!r}"
            pos = found


class TestWindowSplitProperties:
    @given(text=st.text(min_size=0, max_size=3000), max_tokens=_budget,
           overlap=st.integers(min_value=0, max_value=30))
    @settings(max_examples=150, deadline=None)
    def test_exact_reconstruction_without_overlap_loss(self, text, max_tokens, overlap):
        chunks = splitter.window_split(text, max_tokens=max_tokens, overlap=overlap)
        if not text:
            assert chunks == []
            return
        window = max_tokens * 4
        step = max(window - overlap * 4, 1)
        # start positions are exactly the arithmetic progression
        assert len(chunks) == (len(text) + step - 1) // step
        assert all(chunks[i] == text[i * step : i * step + window]
                   for i in range(len(chunks)))


class TestChunkTurnProperties:
    @given(text=_text)
    @settings(max_examples=100, deadline=None)
    def test_span_arithmetic(self, text):
        chunks, _ = kchunk.chunk_turn(text, "p:0", max_tokens=16, overlap=4)
        prev_start = -1
        for c in chunks:
            assert c["char_end"] - c["char_start"] == c["char_length"] == len(c["text"])
            assert c["char_start"] >= max(prev_start, 0)
            assert c["token_count"] == len(c["text"]) // 4
            prev_start = c["char_start"]

    @given(text=_text)
    @settings(max_examples=80, deadline=None)
    def test_preprocess_idempotent_on_output(self, text):
        """normalize_whitespace is idempotent: applying preprocess to its
        own output changes nothing further (fix counters aside)."""
        once, _ = textops.preprocess(text)
        twice, stats = textops.preprocess(once)
        assert twice == once
