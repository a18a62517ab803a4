"""Adversarial differential test: hostile inputs through the Spark
pipeline must chunk identically to the pure-Python kernel recomputation.

The synthetic-corpus differential suite covers realistic payload flavors;
this one feeds deterministic seeded garbage the corpus never produces —
unicode whitespace, ligatures, lone surrogete-free emoji, NBSP runs,
mixed newline conventions, pathological repetition, html fragments inside
prose, 10k-char single words — the classes of input a 100 TB crawl
actually contains.
"""

import random

import pytest

from ragstudio_spark.kernel import chunk as kchunk
from ragstudio_spark.kernel import html_extract, quality, textops
from ragstudio_spark.operators import sniff
from ragstudio_spark.pipeline.job import PipelineConfig, run_pipeline

_PIECES = [
    "normal prose with words ",
    "ﬁﬂ ligatures æ and œ mixed in ",
    "emoji 🎉🔥 and accents éèêàçœÿ ",
    "  nbsp runs here ",
    "tabs\there\tand\there ",
    "\r\nwindows\r\nnewlines\r\n",
    "- Page 42 -\n",
    "| a | b |\n-----\n",
    "<p>html fragment</p> in plain text ",
    "e\nm\nm\na\n",
    "CamelCaseRunsTogetherWithoutSpaces ",
    "ALLCAPSSHOUTING WORDS HERE ",
    "123mixed9digit8words4 ",
    "word " * 50,
    "x" * 600 + " ",
    "短い日本語のテキストです。",
    " line sep para sep ",
    "....... ===== _____ ",
    "a b c d e f g h i j ",
]


def _nasty_text(seed: int) -> str:
    rng = random.Random(seed)
    n = rng.randrange(0, 12)
    return "".join(rng.choice(_PIECES) for _ in range(n))


def _kernel_expected(rows, ctypes):
    """Kernel recomputation of extraction + chunking + gate. Routing
    decisions are taken from the Spark sniff output (``ctypes``), not
    re-derived in Python: Java and Python regex Unicode semantics diverge
    exactly on this suite's hostile inputs (NBSP under ``\\s``, U+2028
    under ``(?m)``), and routing already has its own oracle
    (content_type_distribution) — this test's contract is that WHATEVER
    the route, extraction/chunking/gate match byte-for-byte."""
    out = []
    for conv_id, turn_idx, text in rows:
        text = text or ""
        ctype = ctypes[(conv_id, turn_idx)]
        if ctype == "empty":
            continue
        if ctype == "html":
            extracted = html_extract.extract_main_content(text)
        elif ctype == "pdf":
            extracted = textops.preprocess_before_chunking(text, "pdf")
        else:
            extracted = text
        chunks, _stats = kchunk.chunk_turn(
            extracted, source=f"{conv_id}:{turn_idx}",
            requested_strategy="recursive", max_tokens=400, overlap=50)
        verdict = quality.check_chunks_quality(
            [c["text"] for c in chunks], min_readable_ratio=0.9)
        if not verdict["is_readable"]:
            continue
        for c in chunks:
            out.append((conv_id, turn_idx, c["chunk_index"], c["text"],
                        c["char_start"], c["char_end"]))
    return sorted(out)


class TestAdversarialDifferential:
    @pytest.mark.parametrize("base_seed", [0, 1000])
    def test_hostile_inputs_match_kernel(self, spark, base_seed):
        rows = [(f"adv_{i:04d}", 0, _nasty_text(base_seed + i))
                for i in range(120)]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        ctypes = {(r["conv_id"], r["turn_idx"]): r["content_type"]
                  for r in sniff.with_content_type(df)
                  .select("conv_id", "turn_idx", "content_type").collect()}
        got = sorted(
            (r["conv_id"], r["turn_idx"], r["chunk_index"], r["text"],
             r["char_start"], r["char_end"])
            for r in run_pipeline(df, PipelineConfig()).chunks.collect())
        exp = _kernel_expected(rows, ctypes)
        assert len(got) == len(exp)
        assert got == exp
        assert len(got) > 20  # a meaningful fraction survives the gate


class TestCurationFamilyOnHostileInputs:
    """The round-4 curation family over the same seeded garbage: no
    crashes, internal accounting invariants hold, everything
    deterministic across partitionings."""

    @pytest.fixture(scope="class")
    def nasty_docs(self, spark):
        rows = [(i, ["en", "fr", "de"][i % 3], _nasty_text(1000 + i))
                for i in range(60)]
        return spark.createDataFrame(rows,
                                     "doc_id int, lang string, text string")

    def test_curate_corpus_invariants(self, spark, nasty_docs):
        from ragstudio_spark.operators import curation

        out = curation.curate_corpus(nasty_docs, budget=128).collect()
        ids = [r["doc_id"] for r in out]
        assert len(ids) == len(set(ids))
        for r in out:
            assert r["token_count"] == len(r["redacted_text"]) // 4
            assert 0 <= r["seq_token_offset"] < 128 or r["seq_index"] == 0

    def test_repetition_signals_invariants(self, spark, nasty_docs):
        from ragstudio_spark.operators import quality_signals

        for r in quality_signals.repetition_signals(nasty_docs).collect():
            assert 0 <= r["n_dup_lines"] <= r["n_lines"]
            assert 0 <= r["dup_line_chars"] <= r["total_chars"]
            assert r["top2_count"] >= 0

    def test_c4_accounting_and_line_contract(self, spark, nasty_docs):
        from ragstudio_spark.operators import quality_signals

        got = quality_signals.c4_clean(nasty_docs).collect()
        raw = {r["doc_id"]: r["text"] for r in nasty_docs.collect()}
        for r in got:
            n_lines = len([ln for ln in raw[r["doc_id"]].split("\n") if ln])
            assert r["n_kept"] + r["n_dropped"] == n_lines
            for ln in (r["clean_text"].split("\n") if r["clean_text"] else []):
                assert ln.strip()[-1:] in (".", "!", "?", '"')
                assert "javascript" not in ln.lower()

    def test_span_cut_only_removes_words(self, spark, nasty_docs):
        from collections import Counter

        from ragstudio_spark.operators import dedupe

        spans = dedupe.repeated_spans(nasty_docs, n=8, min_df=2)
        cut = {r["doc_id"]: r["text"] for r in
               dedupe.cut_repeated_spans(nasty_docs, spans, n=8).collect()}
        raw = {r["doc_id"]: r["text"] for r in nasty_docs.collect()}
        for i, text in cut.items():
            # case is preserved now, so the invariant STRENGTHENS: output
            # words are a sub-multiset of the verbatim original words
            orig = Counter(raw[i].split())
            new = Counter(text.split())
            assert all(new[w] <= orig[w] for w in new), i

    def test_curate_sft_invariants(self, spark, nasty_docs):
        """curate_sft over hostile transcripts: NULL texts/roles, empty
        and single-turn conversations, garbage text — no crashes, keys
        unique, packing offsets within budget, contaminated examples
        really gone."""
        from pyspark.sql import functions as F

        from ragstudio_spark.operators import curation, dedupe, sft

        rows = []
        for i in range(42):
            # conv-local CONSECUTIVE turn indices (i // 7) — sft_pairs
            # requires adjacency, so a fixture without consecutive
            # indices mines zero pairs and tests nothing (review-found:
            # the first version used turn_idx = i and was vacuous)
            conv = f"c{i % 7}"
            turn = i // 7
            role = [None, "user", "assistant", "tool"][
                (turn + (i % 7) % 3) % 4]
            text = None if i % 11 == 5 else _nasty_text(2000 + i)
            rows.append((conv, turn, role, text))
        rows.append(("solo", 0, "user", "a single lonely user turn"))
        turns = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string")
        bench = nasty_docs.select("doc_id", "text")
        mined_pairs = sft.sft_pairs(turns).collect()
        assert mined_pairs, "fixture must actually mine user→assistant pairs"
        out = curation.curate_sft(turns, bench, budget=64).collect()
        assert out, "fixture must keep at least one curated example"
        keys = [(r["conv_id"], r["turn_idx"]) for r in out]
        assert len(keys) == len(set(keys))
        for r in out:
            assert r["token_count"] == len(r["example_text"]) // 4
            assert 0 <= r["seq_token_offset"] < 64 or r["seq_index"] == 0
            assert len(r["shard"]) == 1
        # composition honesty: survivors ⊆ mined pairs, and no survivor
        # shares a 13-gram with the benchmark
        mined = {(r["conv_id"], r["turn_idx"]) for r in mined_pairs}
        assert set(keys) <= mined
        ex = spark.createDataFrame(
            [(f"{r['conv_id']}:{r['turn_idx']}", r["example_text"])
             for r in out],
            "doc_id string, text string")
        assert dedupe.ngram_decontaminate(ex, bench, n=13).count() == 0

    def test_family_deterministic_across_partitionings(self, spark, nasty_docs):
        from ragstudio_spark.operators import curation, quality_signals

        rep = nasty_docs.repartition(7)
        for fn in (lambda d: curation.curate_corpus(d, budget=64),
                   quality_signals.repetition_signals,
                   quality_signals.c4_clean):
            a = sorted(map(repr, fn(nasty_docs).collect()))
            b = sorted(map(repr, fn(rep).collect()))
            assert a == b
