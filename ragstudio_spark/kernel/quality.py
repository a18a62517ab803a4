"""Readability / text-quality kernel.

Matches src/core/cli/utils/quality_check.py exactly:

* ``is_valid_word``       — quality_check.py:27-86 (digit+letter mix, mixed-
  case chaos >2 transitions, len>15, ALL-CAPS>5, zero vowels, >5 consecutive
  consonants; NB the reference counts *uppercase accented* vowels as neither
  vowel nor consonant — quirk kept).
* ``check_text_quality``  — quality_check.py:89-179 (empty / whitespace-only /
  <20 chars → unreadable; ratio of valid words ≥ threshold).
* ``check_chunks_quality``— quality_check.py:182-233 (per-document readable-
  chunk ratio gate; batch uses min_readable_ratio=0.9 with per-chunk word
  threshold 0.3 — src/core/cli/commands/batch.py:408).

The same predicate is also expressed as pure Spark column expressions in
``ragstudio_spark.operators.quality_gate`` (JVM-side, no UDF) and as DuckDB
SQL for the oracle — this module is the Python ground truth both are tested
against.
"""

from __future__ import annotations

import re

WORD_RE = re.compile(r"[a-zA-Z0-9éèêëàâäïîôöùûüÿæœÉÈÊËÀÂÄÏÎÔÖÙÛÜŸÆŒ]+")
VOWELS = set("aeiouAEIOUéèêëàâäïîôöùûüÿæœ")
CONSONANTS = set("bcdfghjklmnpqrstvwxyzBCDFGHJKLMNPQRSTVWXYZ")


def has_mixed_case_chaos(word: str) -> bool:
    """>2 upper/lower transitions between adjacent alphabetic chars."""
    if len(word) < 4:
        return False
    transitions = 0
    for i in range(len(word) - 1):
        if word[i].isalpha() and word[i + 1].isalpha():
            if word[i].isupper() != word[i + 1].isupper():
                transitions += 1
    return transitions > 2


def is_valid_word(word: str) -> bool:
    """Heuristic 'looks like a real word' predicate (OCR-garbage detector)."""
    if len(word) < 2:
        return True
    has_digit = any(c.isdigit() for c in word)
    has_letter = any(c.isalpha() for c in word)
    if has_digit and has_letter:
        return False
    if has_mixed_case_chaos(word):
        return False
    if len(word) > 15:
        return False
    if word.isupper() and len(word) > 5:
        return False
    vowel_count = sum(1 for c in word if c in VOWELS)
    consonant_count = sum(1 for c in word if c in CONSONANTS)
    if vowel_count + consonant_count == 0:
        return False
    if vowel_count == 0:
        return False
    run = best = 0
    for c in word:
        if c in CONSONANTS:
            run += 1
            best = max(best, run)
        else:
            run = 0
    if best > 5:
        return False
    return True


def check_text_quality(text: str, min_valid_word_ratio: float = 0.4) -> dict:
    """Per-text readability verdict with valid-word ratio and reason."""
    if not text or len(text.strip()) == 0:
        return {"is_readable": False, "valid_word_ratio": 0.0, "total_chars": 0,
                "reason": "empty_text"}
    text_no_space = text.replace(" ", "").replace("\n", "").replace("\t", "")
    if len(text_no_space) == 0:
        return {"is_readable": False, "valid_word_ratio": 0.0,
                "total_chars": len(text), "reason": "whitespace_only"}
    if len(text_no_space) < 20:
        return {"is_readable": False, "valid_word_ratio": 0.0,
                "total_chars": len(text), "reason": "too_short"}
    words = WORD_RE.findall(text)
    if not words:
        return {"is_readable": False, "valid_word_ratio": 0.0,
                "total_chars": len(text), "reason": "no_words"}
    words_for_analysis = [w for w in words if len(w) >= 2]
    if not words_for_analysis:
        return {"is_readable": False, "valid_word_ratio": 0.0,
                "total_chars": len(text), "reason": "no_long_words"}
    valid = sum(1 for w in words_for_analysis if is_valid_word(w))
    ratio = valid / len(words_for_analysis)
    if ratio < min_valid_word_ratio:
        return {"is_readable": False, "valid_word_ratio": ratio,
                "total_chars": len(text), "reason": "too_many_invalid_words"}
    return {"is_readable": True, "valid_word_ratio": ratio,
            "total_chars": len(text), "reason": None}


def check_chunks_quality(chunk_texts: list[str], min_readable_ratio: float = 0.5) -> dict:
    """Per-document gate over chunk readability (chunk threshold 0.3)."""
    if not chunk_texts:
        return {"is_readable": False, "readable_count": 0, "total_count": 0,
                "readable_ratio": 0.0, "reason": "no_chunks"}
    total = len(chunk_texts)
    readable = sum(
        1 for t in chunk_texts
        if check_text_quality(t, min_valid_word_ratio=0.3)["is_readable"]
    )
    ratio = readable / total
    if ratio < min_readable_ratio:
        return {"is_readable": False, "readable_count": readable,
                "total_count": total, "readable_ratio": ratio,
                "reason": "too_few_readable_chunks"}
    return {"is_readable": True, "readable_count": readable,
            "total_count": total, "readable_ratio": ratio, "reason": None}
