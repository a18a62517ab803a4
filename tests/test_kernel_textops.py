"""Kernel text-op tests, porting the reference's unit invariants
(tests/unit/test_langchain_chunker.py, test_normalize.py, pdf_cleaner tests)."""

from ragstudio_spark.kernel import textops


class TestCleanText:
    def test_page_artifact_and_whitespace(self):
        # reference tests/unit/test_normalize.py:9-15
        assert textops.clean_text("Hello\n- Page 1 -  world") == "Hello world"

    def test_empty(self):
        assert textops.clean_text("") == ""
        assert textops.clean_text(None) == ""

    def test_nfkc(self):
        assert textops.clean_text("ﬁnal") == "final"  # ligature via NFKC

    def test_collapses_all_whitespace(self):
        assert textops.clean_text("a\n\nb\tc   d") == "a b c d"


class TestPdfCleaner:
    def test_vertical_newline_letters(self):
        # the spaced-letter regexes (which treat \n as \s) grab the first
        # four lowercase letters; 'G' stays on its own line — this matches
        # the reference *code* (pdf_cleaner.py:81-83 run before the line
        # scan), not its docstring's idealized "emmaG".
        assert textops.fix_vertical_text("e\nm\nm\na\nG") == "emma\nG"

    def test_vertical_line_scan_merges_short_lines(self):
        # pure line-scan branch: ≥3 consecutive ≤2-char lines merge
        assert textops.fix_vertical_text("ab\ncd\nef\nrest of text") == "abcdef\nrest of text"

    def test_vertical_spaced_letters(self):
        # 4-letter cascade joins "e m m a"; trailing capital stays (there is
        # no 5th letter to pair with) — reference-code behavior.
        assert textops.clean_pdf_text("e m m a G") == "emma G"
        assert textops.clean_pdf_text("v e r t i") == "vert i"
        assert textops.clean_pdf_text("a b c d e f g h") == "abcd efgh"

    def test_hyphenated_line_break(self):
        assert textops.clean_pdf_text("Equipe-\nment") == "Equipement"

    def test_newline_cap(self):
        out = textops.clean_pdf_text("a\n\n\n\n\nb")
        assert "\n\n\n" not in out

    def test_table_artifacts(self):
        text = "keep\n| | | |\n-----\n=====\nalso keep"
        assert textops.clean_table_artifacts(text) == "keep\nalso keep"

    def test_preprocess_dispatch(self):
        raw = "Equipe-\nment\n| | |"
        assert textops.preprocess_before_chunking(raw, "pdf") == "Equipement"
        assert textops.preprocess_before_chunking(raw, "markdown") == raw

    def test_aggressive_drops_junk_lines(self):
        out = textops.clean_pdf_text("good line here\n%%%%%%%%%%\n", aggressive=True)
        assert "%%%" not in out


class TestPreprocessor:
    def test_fix_extraction_errors(self):
        # reference test_langchain_chunker.py:22-35
        text = "Cela apermis de distinguer. Ala fin du mot eouvert."
        fixed, n = textops.fix_extraction_errors(text)
        assert "a permis" in fixed
        assert "A la" in fixed
        assert "e ouvert" in fixed
        assert n == 3

    def test_remove_page_numbers(self):
        # reference test_langchain_chunker.py:37-44
        text = "End of page\n42\nNew Chapter begins"
        out, n = textops.remove_page_numbers(text)
        assert "\n42\n" not in out
        assert n == 1

    def test_page_number_requires_capital(self):
        text = "value\n42\nlowercase next"
        out, n = textops.remove_page_numbers(text)
        assert n == 0 and "\n42\n" in out

    def test_normalize_whitespace(self):
        # reference test_langchain_chunker.py:46-52
        out = textops.normalize_whitespace("Text  with    spaces\n\n\n\nand newlines")
        assert "  " not in out
        assert "\n\n\n" not in out

    def test_preprocess_stats(self):
        text = "Cela apermis\n5\nDe continuer Ala page"
        out, stats = textops.preprocess(text)
        assert stats["extraction_fixes"] == 2
        assert stats["page_numbers_removed"] == 1
        assert "a permis" in out and "A la" in out


class TestOcrQuality:
    def test_clean_text_scores_high(self):
        q = textops.detect_ocr_quality("A perfectly ordinary sentence without issues.")
        assert q["quality_score"] >= 0.8
        assert not q["needs_repair"]

    def test_artifact_penalties(self):
        q = textops.detect_ocr_quality("weird ■ blocks  and camelCase æ here")
        assert q["needs_repair"]
        assert "geometric_artifacts" in q["issues_detected"]
        assert "missing_spaces" in q["issues_detected"]

    def test_french_missing_accent_heuristic(self):
        q = textops.detect_ocr_quality("une grande pense affiche de mode belle ecole")
        assert "missing_accents" in q["issues_detected"]


class TestOcrRepair:
    def test_ligatures_and_shapes(self):
        out = textops.ocr_rule_based_repair("ﬁn ﬂow ■ text")
        assert out.startswith("fin flow")
        assert "■" not in out

    def test_camel_case_space(self):
        assert "camel Case" in textops.ocr_rule_based_repair("camelCase")

    def test_repair_metrics_empty(self):
        text, metrics = textops.repair_text("   ")
        assert metrics["method"] == "none"

    def test_repair_metrics_counts(self):
        _, metrics = textops.repair_text("aaaBbb")
        assert metrics["corrections_applied"] > 0
        assert metrics["method"] == "rule_based"
