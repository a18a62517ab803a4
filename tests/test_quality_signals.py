"""Gopher-style repetition signals (operators/quality_signals.py)."""

from ragstudio_spark.operators import quality_signals


class TestRepetitionSignals:
    def test_counts_on_constructed_docs(self, spark):
        df = spark.createDataFrame(
            [(0, "unique one\nunique two\nsame line\nsame line"),
             (1, "spark spark spark spark"),
             (2, ""),
             (3, "one two three")],
            "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               quality_signals.repetition_signals(df).collect()}

        r0 = got[0]
        assert r0["n_lines"] == 4
        assert r0["n_dup_lines"] == 2                 # both 'same line' rows
        assert r0["dup_line_chars"] == 2 * len("same line")
        # top 2-gram of doc 0: every 2-gram unique except 'line same'?
        # words: unique one unique two same line same line →
        # 'same line' occurs twice
        assert r0["top2_count"] == 2
        assert r0["top2_chars"] == 2 * len("same line")

        r1 = got[1]
        assert r1["n_lines"] == 1 and r1["n_dup_lines"] == 0
        assert r1["top2_count"] == 3                  # 'spark spark' ×3
        assert r1["top2_chars"] == 3 * len("spark spark")

        r2 = got[2]                                   # empty doc → zeros
        assert (r2["n_lines"], r2["n_dup_lines"], r2["top2_count"]) == (0, 0, 0)
        assert r2["total_chars"] == 0

        r3 = got[3]                                   # no repetition
        assert r3["n_dup_lines"] == 0 and r3["top2_count"] == 1

    def test_tie_break_is_smallest_gram(self, spark):
        df = spark.createDataFrame(
            [(0, "b b a a")],                          # 'b b','b a','a a' ×1
            "doc_id int, text string")
        r = quality_signals.repetition_signals(df).first()
        assert r["top2_count"] == 1
        assert r["top2_chars"] == len("a a")          # min gram among ties

    def test_fraction_derivation(self, spark):
        """Callers derive the Gopher fractions from the integer columns."""
        text = "dup\ndup\n" + "fresh content line here"
        df = spark.createDataFrame([(0, text)], "doc_id int, text string")
        r = quality_signals.repetition_signals(df).first()
        dup_frac = r["dup_line_chars"] / r["total_chars"]
        assert 0 < dup_frac < 1
        assert r["n_dup_lines"] / r["n_lines"] == 2 / 3


class TestRepetitionFilter:
    def test_drops_repetitive_docs_only(self, spark):
        clean = ("a reasonably varied document with plenty of distinct "
                 "words across several different lines\nand another line "
                 "with even more unique content to balance things out")
        spam = "buy now\nbuy now\nbuy now\nbuy now\nbuy now"
        df = spark.createDataFrame(
            [(0, clean), (1, spam), (2, "spark " * 50)],
            "doc_id int, text string")
        kept = {r["doc_id"] for r in
                quality_signals.repetition_filter(df).collect()}
        assert kept == {0}  # 1: dup lines; 2: one 2-gram is all the text

    def test_empty_doc_passes(self, spark):
        """Zero-char docs must not divide by zero or get dropped by the
        repetition rules (length gates are a different filter)."""
        df = spark.createDataFrame([(0, "")], "doc_id int, text string")
        assert quality_signals.repetition_filter(df).count() == 1


class TestC4Clean:
    def test_line_rules(self, spark):
        text = ("A proper sentence with enough words.\n"
                "too short.\n"                      # < 3 words
                "no terminal punctuation here\n"
                "This line mentions javascript sadly.\n"
                'A quoted ending counts here too"\n'
                "Final good line stays right here!")
        df = spark.createDataFrame([(0, text)], "doc_id int, text string")
        r = quality_signals.c4_clean(df).first()
        kept = r["clean_text"].split("\n")
        assert kept == ["A proper sentence with enough words.",
                        'A quoted ending counts here too"',
                        "Final good line stays right here!"]
        assert r["n_kept"] == 3 and r["n_dropped"] == 3

    def test_page_rules(self, spark):
        good = "One good sentence here. " * 6
        df = spark.createDataFrame(
            [(0, good),
             (1, good + " lorem ipsum"),
             (2, good + " with a { brace"),
             (3, "Only two sentences. Just these two!")],
            "doc_id int, text string")
        got = {r["doc_id"]: r["c4_keep"]
               for r in quality_signals.c4_clean(df).collect()}
        assert got == {0: True, 1: False, 2: False, 3: False}

    def test_null_text_zero_fills(self, spark):
        """NULL text = empty text: zero counts, empty clean_text, keep
        false — never the F.size(NULL) = -1 / NULL-keep propagation
        (the repetition_signals NULL convention, applied here too)."""
        df = spark.createDataFrame([(0, None), (1, "")],
                                   "doc_id int, text string")
        rows = {r["doc_id"]: r for r in quality_signals.c4_clean(df).collect()}
        for i in (0, 1):
            r = rows[i]
            assert r["clean_text"] == ""
            assert r["n_kept"] == 0 and r["n_dropped"] == 0
            assert r["n_sentences"] == 0
            assert r["c4_keep"] is False


class TestReviewRegressions:
    def test_null_text_passes_filter(self, spark):
        """NULL text must behave like empty text (zero counts), not get
        silently dropped by a NULL keep-predicate."""
        long_clean = " ".join(f"word{i}" for i in range(60))
        df = spark.createDataFrame([(0, None), (1, long_clean)],
                                   "doc_id int, text string")
        sig = {r["doc_id"]: r
               for r in quality_signals.repetition_signals(df).collect()}
        assert sig[0]["total_chars"] == 0
        kept = {r["doc_id"]
                for r in quality_signals.repetition_filter(df).collect()}
        assert kept == {0, 1}

    def test_threshold_boundary_uses_round_not_truncation(self, spark):
        """A doc whose fraction EQUALS the threshold must be kept:
        int(0.00397e6)=3969 would shift the <= boundary and drop it."""
        la, lb = "x" * 99, "y" * 50
        filler = "u" * (100000 - (3 * 99 + 2 * 50) - 5)
        text = "\n".join([la, la, la, lb, lb, filler])
        df = spark.createDataFrame([(0, text)], "doc_id int, text string")
        r = quality_signals.repetition_signals(df).first()
        assert (r["dup_line_chars"], r["total_chars"]) == (397, 100000)
        kept = quality_signals.repetition_filter(
            df, max_dup_line_frac=0.00397, max_top2_frac=1.0).count()
        assert kept == 1
