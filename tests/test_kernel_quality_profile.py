"""Quality-gate, profiler, strategy-selector, langid, html kernel tests.

Ports reference invariants from tests/unit/test_strategy_selector.py and the
OCR-garbage fixtures in quality_check.py:93-97.
"""

from ragstudio_spark.kernel import html_extract, langid, profile, quality


class TestValidWord:
    def test_ocr_garbage_rejected(self):
        # NB: "sjuaweoejdep" (from the reference docstring) actually PASSES
        # the reference's own rules (has vowels, short consonant runs) — we
        # match the code, not the docstring.
        for w in ["aJANe0", "UONeIOeNEJ", "JUSWEWLIOJUOD", "bcdfgklmnp"]:
            assert not quality.is_valid_word(w)

    def test_normal_words_accepted(self):
        for w in ["bonjour", "hello", "Peugeot", "été", "world"]:
            assert quality.is_valid_word(w)

    def test_short_words_ok(self):
        assert quality.is_valid_word("a")
        assert quality.is_valid_word("è")

    def test_digit_letter_mix(self):
        assert not quality.is_valid_word("S89IN0SXe")

    def test_all_caps_long(self):
        assert not quality.is_valid_word("ABCDEFG")
        assert quality.is_valid_word("NASA")  # ≤5 caps fine if vowel present

    def test_too_long(self):
        assert not quality.is_valid_word("a" * 16)

    def test_consonant_run(self):
        assert not quality.is_valid_word("astrngthsx")


class TestTextQuality:
    def test_garbage_fixture_unreadable(self):
        garbage = ".S89IN0SXe ~QuaWeanesedus| Jeu900 B,) sjuaweoejdep sap aJANe0"
        q = quality.check_text_quality(garbage)
        assert not q["is_readable"]

    def test_clean_text_readable(self):
        q = quality.check_text_quality(
            "Ce document décrit la configuration du moteur hybride de la voiture."
        )
        assert q["is_readable"]
        assert q["valid_word_ratio"] > 0.9

    def test_empty_and_short(self):
        assert not quality.check_text_quality("")["is_readable"]
        assert not quality.check_text_quality("   \n ")["is_readable"]
        assert not quality.check_text_quality("short text")["is_readable"]  # <20 chars

    def test_chunks_gate(self):
        good = ["A perfectly readable chunk of text here." * 2] * 9
        bad = [".S89IN0SXe ~QuaWeanesedus| Jeu900 sjuaweoejdep aJANe0 xptkq zzz"]
        verdict = quality.check_chunks_quality(good + bad, min_readable_ratio=0.9)
        assert verdict["is_readable"]
        verdict = quality.check_chunks_quality(bad * 5 + good[:5], min_readable_ratio=0.9)
        assert not verdict["is_readable"]
        assert quality.check_chunks_quality([], 0.9)["reason"] == "no_chunks"


class TestProfiler:
    def test_type_by_keywords(self):
        assert profile.detect_document_type("voici le sommaire du texte") == "rapport"
        assert profile.detect_document_type("les caractéristiques techniques") == "fiche_technique"
        assert profile.detect_document_type("introduction au sujet") == "article"

    def test_type_by_length(self):
        assert profile.detect_document_type("x" * 5001) == "rapport"
        assert profile.detect_document_type("x" * 1001) == "article"
        assert profile.detect_document_type("court") == "document_court"

    def test_type_by_filename(self):
        assert profile.detect_document_type("txt", "fiche_moteur.pdf") == "fiche_technique"
        assert profile.detect_document_type("txt", "rapport_2024.docx") == "rapport"

    def test_headings_tables_lists(self):
        md = "# Title\n\n- item\n\n| a | b | c | d | e | f |"
        assert profile.has_headings(md)
        assert profile.has_tables(md)
        assert profile.has_lists(md)
        assert not profile.has_headings("plain prose only here")

    def test_hierarchy_depth(self):
        assert profile.hierarchy_depth("# a\n## b\n### c\n") == 3
        assert profile.hierarchy_depth("1. a\n1.2. b\n1.2.3. c\n") == 3
        assert profile.hierarchy_depth("no structure") == 1

    def test_structure_score_bounds(self):
        p = profile.analyze_text("# A\n## B\n### C\n- list\n| | | | | | |" + "x. " * 3000)
        assert 0.0 <= p["structure_score"] <= 1.0
        assert p["structure_score"] >= 0.9

    def test_avg_sentence_length(self):
        assert profile.avg_sentence_length("ab. abcd.") == 3.0
        assert profile.avg_sentence_length("") == 0.0


class TestStrategySelector:
    # each branch of the decision tree — reference test_strategy_selector.py
    def _profile(self, **over):
        base = {
            "type": "article", "length_tokens": 2000, "has_headings": False,
            "has_tables": False, "hierarchy_depth": 1, "structure_score": 0.3,
        }
        base.update(over)
        return base

    def test_short_document(self):
        cfg = profile.select_chunking_strategy(self._profile(length_tokens=500))
        assert (cfg["strategy"], cfg["max_tokens"], cfg["overlap"]) == ("recursive", 300, 30)
        assert cfg["reason"] == "short_document"

    def test_structured_document(self):
        cfg = profile.select_chunking_strategy(
            self._profile(has_headings=True, hierarchy_depth=2))
        assert cfg["strategy"] == "parent_child"
        assert cfg["reason"] == "structured_document"

    def test_headings_beat_tables(self):
        cfg = profile.select_chunking_strategy(
            self._profile(has_headings=True, hierarchy_depth=3, has_tables=True))
        assert cfg["reason"] == "structured_document"

    def test_technical_document(self):
        cfg = profile.select_chunking_strategy(self._profile(type="rapport"))
        assert (cfg["strategy"], cfg["max_tokens"]) == ("semantic", 500)

    def test_tabular(self):
        cfg = profile.select_chunking_strategy(self._profile(has_tables=True))
        assert cfg["strategy"] == "late"

    def test_high_structure(self):
        cfg = profile.select_chunking_strategy(self._profile(structure_score=0.7))
        assert cfg["reason"] == "high_structure_score"

    def test_long_document(self):
        cfg = profile.select_chunking_strategy(self._profile(length_tokens=6000))
        assert (cfg["strategy"], cfg["max_tokens"], cfg["overlap"]) == ("semantic", 600, 80)

    def test_default(self):
        cfg = profile.select_chunking_strategy(self._profile())
        assert cfg["reason"] == "default_fallback"

    def test_lazy_selection_matches_full_profile(self):
        """select_strategy_for_text (the fused hot path's lazy entry, r7)
        must decide identically to select_chunking_strategy∘analyze_text
        on both sides of the short-document threshold and across every
        branch trigger."""
        texts = [
            "short note",
            "## H\n### H2\n" + ("word " * 1200),       # structured, long
            "| a | b |\n|---|---|\n" + ("word " * 1100),  # tables, long
            ("word " * 1100),                           # long unstructured
            ("word " * 6000),                           # very long
            "",                                          # empty
            "x" * 3999,                                  # just under threshold
            "x" * 4000,                                  # at threshold
        ]
        for t in texts:
            full = profile.select_chunking_strategy(profile.analyze_text(t))
            lazy = profile.select_strategy_for_text(t)
            assert full == lazy, t[:40]

    def test_validate_config(self):
        assert profile.validate_strategy_config(
            {"strategy": "recursive", "max_tokens": 400, "overlap": 50, "reason": "x"})
        assert not profile.validate_strategy_config(
            {"strategy": "bogus", "max_tokens": 400, "overlap": 50, "reason": "x"})
        assert not profile.validate_strategy_config(
            {"strategy": "recursive", "max_tokens": 100, "overlap": 100, "reason": "x"})


class TestLangId:
    def test_english(self):
        assert langid.detect_language("the cat and the dog went to the park") == "en"

    def test_french(self):
        assert langid.detect_language(
            "la voiture est dans le garage pour les réparations") == "fr"

    def test_german(self):
        assert langid.detect_language("der Hund und die Katze sind nicht hier") == "de"

    def test_none_on_no_signal(self):
        assert langid.detect_language("zzzz qqqq xxxx") is None
        assert langid.detect_language("") is None


HTML_PAGE = """
<html><head><title>Site title</title><style>.x{color:red}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Blog</a></nav>
<div class="sidebar"><li><a href="/x">Link one</a></li><li><a href="/y">Link two</a></li></div>
<article>
<h1>The Real Headline</h1>
<p>This is the main paragraph of the page with plenty of informative prose content.</p>
<p>A second paragraph continues the argument with more meaningful detail for readers.</p>
</article>
<footer><a href="/c">Contact</a> <a href="/d">Terms</a> copyright</footer>
</body></html>
"""


class TestHtmlExtract:
    def test_main_content_kept_boilerplate_dropped(self):
        out = html_extract.extract_main_content(HTML_PAGE)
        assert "The Real Headline" in out
        assert "main paragraph of the page" in out
        assert "second paragraph" in out
        assert "Home" not in out
        assert "Link one" not in out
        assert "Contact" not in out
        assert "color:red" not in out

    def test_blocks_joined_with_double_newline(self):
        out = html_extract.extract_main_content(HTML_PAGE)
        assert out.count("\n\n") == 2

    def test_high_link_density_paragraph_dropped(self):
        html = ('<p><a href="/1">one link text</a> <a href="/2">two link text</a> tiny</p>'
                "<p>Normal prose paragraph with enough length to be considered real content.</p>")
        out = html_extract.extract_main_content(html)
        assert "Normal prose" in out
        assert "one link text" not in out

    def test_empty_and_plain(self):
        assert html_extract.extract_main_content("") == ""
        assert html_extract.extract_main_content("no tags at all") == ""
