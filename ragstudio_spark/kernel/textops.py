"""Text normalization / repair kernel.

Semantics mirror the reference pipeline (sekkaahmed/ragstudio) operator for
operator — citations point at the reference file:line each function matches:

* ``clean_text``                 — src/workflows/ingest/normalize.py:20-43
* ``detect_ocr_quality``         — src/workflows/ingest/ocr_repair.py:217-259
* ``ocr_rule_based_repair``      — src/workflows/ingest/ocr_repair.py:99-134
* ``clean_pdf_text``             — src/workflows/ingest/pdf_cleaner.py:18-67
* ``fix_vertical_text``          — src/workflows/ingest/pdf_cleaner.py:70-125
* ``clean_table_artifacts``      — src/workflows/ingest/pdf_cleaner.py:144-163
* ``preprocess_before_chunking`` — src/workflows/ingest/pdf_cleaner.py:166-185
* ``fix_extraction_errors``      — src/core/chunk/langchain_chunker.py:29-59
* ``remove_page_numbers``        — src/core/chunk/langchain_chunker.py:61-73
* ``normalize_whitespace``       — src/core/chunk/langchain_chunker.py:75-82
* ``preprocess``                 — src/core/chunk/langchain_chunker.py:84-105

The implementations are new code: only the externally observable behavior
(regex languages, ordering, thresholds, counters) is kept identical, because
per-turn output equality with the reference is the correctness contract.
"""

from __future__ import annotations

import re
import unicodedata

# --- normalize.py semantics -------------------------------------------------

_WHITESPACE_RE = re.compile(r"\s+")
_PAGE_ARTIFACT_RE = re.compile(r"-\s*Page \d+\s*-", re.IGNORECASE)


def clean_text(text: str) -> str:
    """NFKC-normalize, strip ``- Page N -`` artifacts, collapse whitespace."""
    if not text:
        return ""
    text = unicodedata.normalize("NFKC", text)
    text = _PAGE_ARTIFACT_RE.sub(" ", text)
    text = _WHITESPACE_RE.sub(" ", text)
    return text.strip()


# --- ocr_repair.py semantics -------------------------------------------------

_MULTISPACE_RE = re.compile(r"\s{2,}")
_MISSING_SPACE_RE = re.compile(r"[a-z][A-Z]")
_FRENCH_ANY_RE = re.compile(r"\b[a-zàâäéèêëïîôöùûüÿç]+\b")


# Prescan strategy (profiled on the synthetic corpus, 3k turns): a single
# combined alternation regex costs ~0.10 ms/doc in Python's backtracking
# engine — the prescan WAS the bottleneck, not the fixes. Single-char
# classes are replaced by literal `in` scans (memchr speed, exact for a
# one-char class) and `"  " in text` short-circuits the whitespace regex;
# the two remaining position-pair checks stay regex. Net: ~1.7× on the
# artifact prescan, measured, with identical decisions.
_LIGATURE_CHARS = "ﬁﬂæœ"
_GEOMETRIC_CHARS = "■□▪▫"

# one findall with a capture group counts e- and é-endings in a single
# scan (measured equal + ~1.25× vs two findalls)
_FRENCH_ENDING_RE = re.compile(r"\b[a-zàâäéèêëïîôöùûüÿç]*([eé])\b")


def detect_ocr_quality(text: str) -> dict:
    """Penalty-based OCR quality score; ``needs_repair`` below 0.8."""
    issues = []
    quality_score = 1.0

    if any(c in text for c in _LIGATURE_CHARS):
        issues.append("ligatures_detected")
        quality_score -= 0.1
    if any(c in text for c in _GEOMETRIC_CHARS):
        issues.append("geometric_artifacts")
        quality_score -= 0.05
    if "  " in text or _MULTISPACE_RE.search(text):
        issues.append("excessive_spacing")
        quality_score -= 0.05
    if _MISSING_SPACE_RE.search(text):
        issues.append("missing_spaces")
        quality_score -= 0.1

    lower = text.lower()
    if _FRENCH_ANY_RE.search(lower):
        endings = _FRENCH_ENDING_RE.findall(lower)
        e_endings = endings.count("e")
        e_accent_endings = len(endings) - e_endings
        if e_endings > e_accent_endings * 2:
            issues.append("missing_accents")
            quality_score -= 0.15

    quality_score = max(0.0, quality_score)
    return {
        "quality_score": quality_score,
        "issues_detected": issues,
        "needs_repair": quality_score < 0.8,
        "repair_priority": (
            "high" if quality_score < 0.6 else "medium" if quality_score < 0.8 else "low"
        ),
    }


# Ordered rule table; order is part of the contract.
_OCR_CORRECTIONS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"ﬁ"), "fi"),
    (re.compile(r"ﬂ"), "fl"),
    (re.compile(r"æ"), "ae"),
    (re.compile(r"œ"), "oe"),
    (re.compile(r"–"), "-"),
    (re.compile(r"—"), "-"),
    (re.compile(r"\be\b"), "é"),
    (re.compile(r"([aeiou])e\b"), r"\1é"),
    (re.compile(r"\s+"), " "),
    (re.compile(r"([a-zA-Z])([A-Z])"), r"\1 \2"),
    (re.compile(r"[■□▪▫]"), ""),
    (re.compile(r"\.{3,}"), "..."),
    (re.compile(r"={2,}"), ""),
    (re.compile(r"[^\w\s\-.,;:!?()\[\]{}\"\']"), ""),
    (re.compile(r"([a-z])([A-Z])"), r"\1 \2"),
]


def ocr_rule_based_repair(text: str) -> str:
    """Apply the ordered rule-based OCR correction table, then strip."""
    for pattern, replacement in _OCR_CORRECTIONS:
        text = pattern.sub(replacement, text)
    return text.strip()


def count_corrections(original: str, corrected: str) -> int:
    """Char-level correction count (length delta, or positional diff)."""
    if len(original) != len(corrected):
        return abs(len(original) - len(corrected))
    return sum(1 for a, b in zip(original, corrected) if a != b)


def repair_text(text: str) -> tuple[str, dict]:
    """Rule-based repair + metrics (the AI-correction tier is out of scope)."""
    if not text or not text.strip():
        return text, {"repair_score": 0.0, "corrections_applied": 0, "method": "none"}
    original = text
    repaired = ocr_rule_based_repair(text)
    corrections = count_corrections(original, repaired)
    return repaired, {
        "original_length": len(original),
        "final_length": len(repaired),
        "corrections_applied": corrections,
        "repair_score": corrections / max(len(original), 1),
        "method": "rule_based",
    }


# --- pdf_cleaner.py semantics -------------------------------------------------

_HYPHEN_BREAK_RE = re.compile(r"(\w)-\n(\w)")
_EXCESS_NEWLINES_RE = re.compile(r"\n{3,}")
_MULTI_SPACE_RE = re.compile(r"  +")
_SPACED4_RE = re.compile(r"\b([a-z])\s+([a-z])\s+([a-z])\s+([a-z])", re.IGNORECASE)
_SPACED3_RE = re.compile(r"\b([a-z])\s+([a-z])\s+([a-z])", re.IGNORECASE)
_SPACED2_RE = re.compile(r"\b([a-z])\s+([a-z])", re.IGNORECASE)
_ISOLATED_CHAR_RE = re.compile(r"\b[a-z]\b")
_TABLE_SEP_RE = re.compile(r"^[\s\|\-_=+]+$")


def fix_vertical_text(text: str) -> str:
    """Rejoin vertical-text artifacts: spaced single letters and runs of
    short (≤2 char) lines (≥3 in a row, look-ahead capped at 15)."""
    text = _SPACED4_RE.sub(r"\1\2\3\4", text)
    text = _SPACED3_RE.sub(r"\1\2\3", text)
    text = _SPACED2_RE.sub(r"\1\2", text)

    lines = text.split("\n")
    fixed: list[str] = []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if len(line) <= 2 and line and not line.isspace():
            buffer = [line]
            j = i + 1
            while j < len(lines) and j < i + 15:
                nxt = lines[j].strip()
                if len(nxt) <= 2 and nxt and not nxt.isspace():
                    buffer.append(nxt)
                    j += 1
                else:
                    break
            if len(buffer) >= 3:
                fixed.append("".join(buffer))
                i = j
            else:
                fixed.extend(buffer)
                i += len(buffer)
        else:
            fixed.append(line)
            i += 1
    return "\n".join(fixed)


def _is_meaningful_line(line: str) -> bool:
    if not line or len(line) < 2:
        return False
    alpha = sum(c.isalnum() for c in line)
    return alpha / len(line) >= 0.3


def clean_pdf_text(text: str, aggressive: bool = False) -> str:
    """Fix PDF extraction artifacts: vertical text, hyphen line-breaks,
    newline/space runs, per-line strip (+ aggressive junk-line removal)."""
    if not text:
        return text
    text = fix_vertical_text(text)
    text = _HYPHEN_BREAK_RE.sub(r"\1\2", text)
    text = _EXCESS_NEWLINES_RE.sub("\n\n", text)
    text = _MULTI_SPACE_RE.sub(" ", text)
    lines = [line.strip() for line in text.split("\n")]
    text = "\n".join(lines)
    if aggressive:
        lines = [line for line in lines if _is_meaningful_line(line)]
        text = "\n".join(lines)
        text = _ISOLATED_CHAR_RE.sub("", text)
    return text


def clean_table_artifacts(text: str) -> str:
    """Drop lines made only of table-rule characters ``| - _ = +`` and space."""
    return "\n".join(
        line for line in text.split("\n") if not _TABLE_SEP_RE.match(line)
    )


def preprocess_before_chunking(text: str, source_type: str = "pdf") -> str:
    """Content-type-specific pre-chunk cleanup dispatch."""
    if source_type == "pdf":
        text = clean_pdf_text(text, aggressive=False)
        text = clean_table_artifacts(text)
    elif source_type in ("html", "docx"):
        text = clean_pdf_text(text, aggressive=False)
    return text


# --- langchain_chunker.py TextPreprocessor semantics --------------------------

_SPACE_FIXES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"\bapermis\b"), "a permis"),
    (re.compile(r"\bAla\b"), "A la"),
    (re.compile(r"\basouvent\b"), "a souvent"),
    (re.compile(r"\bapresque\b"), "a presque"),
    (re.compile(r"ad'ailleurs"), "a d'ailleurs"),
    (re.compile(r"\bDela\b"), "De la"),
    (re.compile(r"\beouvert\b"), "e ouvert"),
    (re.compile(r"»va\b"), "» va"),
    (re.compile(r"»de\b"), "» de"),
    (re.compile(r"\bouvent(?=[A-ZÀÉÈ])"), "ouvent "),
]

_PAGE_NUM_RE = re.compile(r"\n(\d{1,3})\n(?=[A-ZÀÉÈÊ])")
_TWO_SPACES_RE = re.compile(r" {2,}")
_THREE_NEWLINES_RE = re.compile(r"\n{3,}")

# Literal-substring prescan to skip the 10 sequential regex passes on the
# (overwhelmingly common) texts containing none of the trigger tokens.
# Every pattern's match necessarily CONTAINS its literal token (the regexes
# only add \b / lookahead around these literals), so `in`-presence is a
# strict superset of regex-match — false positives just fall through to the
# exact sequential path below, which is unchanged (order is part of the
# contract). Measured 15× cheaper than the combined-alternation prescan it
# replaces (memchr vs Python re backtracking over the full text).
_SPACE_FIX_TOKENS = ("apermis", "Ala", "asouvent", "apresque", "ad'ailleurs",
                     "Dela", "eouvert", "»va", "»de", "ouvent")


def fix_extraction_errors(text: str) -> tuple[str, int]:
    """French missing-space fixes; returns (text, number_of_fixes)."""
    if not any(tok in text for tok in _SPACE_FIX_TOKENS):
        return text, 0
    fixes = 0
    for pattern, replacement in _SPACE_FIXES:
        # subn = sub + count in ONE scan (counts non-overlapping matches,
        # exactly what findall counted — r7)
        text, n = pattern.subn(replacement, text)
        fixes += n
    return text, fixes


def remove_page_numbers(text: str) -> tuple[str, int]:
    """Strip isolated 1-3 digit page numbers between paragraphs."""
    text, removed = _PAGE_NUM_RE.subn("\n", text)
    return text, removed


def normalize_whitespace(text: str) -> str:
    """Collapse space runs, cap newline runs at 2, strip ends."""
    text = _TWO_SPACES_RE.sub(" ", text)
    text = _THREE_NEWLINES_RE.sub("\n\n", text)
    return text.strip()


def preprocess(text: str) -> tuple[str, dict]:
    """Full pre-chunk pipeline; returns (text, stats) with fix counters."""
    text, fixes = fix_extraction_errors(text)
    text, removed = remove_page_numbers(text)
    text = normalize_whitespace(text)
    return text, {"extraction_fixes": fixes, "page_numbers_removed": removed}
