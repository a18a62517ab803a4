"""Heuristic language identification (from scratch; no external models).

Replaces the reference's ``langdetect.detect(text[:5000])`` (reference:
src/workflows/ingest/normalize.py:46-54, seeded for determinism) with a
deterministic stopword-profile scorer. The contract preserved from the
reference is the *interface*: first 5000 chars, returns an ISO-639-1 code or
``None`` when nothing can be detected; downstream the allow-list filter keeps
only configured languages (default fr/en — src/core/config/defaults.py).

The scoring formula is intentionally simple enough to express identically in
Spark column expressions and in DuckDB SQL (see operators/textstats.py), so
the distributed operator is oracle-checkable:

    score(lang) = number of occurrences of that language's stopword tokens
    winner     = argmax score, ties broken by language code ascending,
                 None if the best score is 0
"""

from __future__ import annotations

import re

# Compact, high-frequency function-word profiles. Word-boundary matched,
# lowercase. Chosen to discriminate the table languages on short
# snippets. The nl/sv/da/ro/pl rows are the round-5 table extension: the
# measured divergence (scripts/langid_divergence.py) showed every
# out-of-table Germanic/Romance/Slavic fixture misattributed — Dutch to
# 'en' and Danish/Polish partly to 'en', which the default fr/en
# allow-list then WRONGLY KEEPS. Their profiles deliberately avoid
# tokens frequent in the other table languages (e.g. no Dutch "de"/"en",
# which would collide with French/English text) so existing predictions
# cannot flip; shared low-risk tokens (sv/da "som", de/sv "den") count
# for both owners, exactly as the per-language findall did.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "with", "for",
           "was", "this", "are", "not", "have"),
    "fr": ("le", "la", "les", "des", "une", "est", "dans", "pour", "que",
           "qui", "pas", "avec", "sur", "nous", "vous"),
    "es": ("el", "los", "las", "una", "es", "en", "que", "por", "para",
           "con", "del", "se", "su", "como", "más"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "für", "auf", "den", "von", "sich", "auch"),
    "it": ("il", "la", "che", "di", "è", "non", "per", "una", "sono", "con",
           "del", "gli", "questo", "come", "più"),
    "pt": ("o", "os", "uma", "é", "em", "que", "não", "para", "com", "do",
           "da", "se", "por", "mais", "como"),
    "nl": ("het", "een", "niet", "zijn", "ook", "naar", "wordt", "heeft",
           "maar", "bij", "worden", "deze", "wij", "geen", "nog"),
    "sv": ("och", "att", "som", "är", "inte", "den", "ett", "han", "hon",
           "vid", "från", "för", "på", "medan", "efter"),
    "da": ("og", "det", "ikke", "som", "til", "med", "han", "hun", "efter",
           "hvor", "ved", "blev", "af", "på", "mens"),
    "ro": ("și", "să", "nu", "din", "este", "sunt", "care", "pentru",
           "după", "când", "în", "că", "cu", "dar", "unde"),
    # NB no single-letter tokens anywhere in the table: Polish "w"/"z"
    # are high-frequency but standalone 'w'/'z' also occur in English
    # enumerations ("options w, x, y, z"), which would flip predictions
    # and wrongly DROP allowed documents (review-found); multi-letter
    # function words carry the discrimination instead
    "pl": ("nie", "się", "jest", "ale", "jak", "tak", "przez", "tym",
           "być", "oraz", "że", "dla", "już", "aby", "przed"),
}

_PATTERNS = {
    lang: re.compile(r"\b(?:" + "|".join(map(re.escape, words)) + r")\b")
    for lang, words in STOPWORDS.items()
}

# single-tokenization scorer: because every stopword is a pure word-char
# token, \b-delimited matching over the lowered snippet is equivalent to
# exact-matching \w+ tokens — one regex pass + dict lookups instead of six
# full scans (a token shared by several languages counts for each, exactly
# as the per-language findall did)
_TOKEN_RE = re.compile(r"\w+")
_TOKEN_LANGS: dict[str, tuple[str, ...]] = {}
for _lang, _words in STOPWORDS.items():
    for _w in _words:
        _TOKEN_LANGS.setdefault(_w, ())
        _TOKEN_LANGS[_w] = _TOKEN_LANGS[_w] + (_lang,)


def language_scores(text: str) -> dict[str, int]:
    """Stopword-hit counts per language over the first 5000 chars."""
    snippet = text[:5000].lower()
    scores = dict.fromkeys(STOPWORDS, 0)
    for token in _TOKEN_RE.findall(snippet):
        langs = _TOKEN_LANGS.get(token)
        if langs:
            for lang in langs:
                scores[lang] += 1
    return scores


def detect_language(text: str) -> str | None:
    """Best-scoring language, ties broken alphabetically; None if no hits."""
    if not text:
        return None
    scores = language_scores(text)
    best_lang = min(
        scores, key=lambda lang: (-scores[lang], lang)
    )
    return best_lang if scores[best_lang] > 0 else None
