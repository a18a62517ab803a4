"""Document profiling + chunking-strategy selection kernel.

Python ground truth for the Spark column-expression implementations in
``operators/profiler.py`` and ``operators/strategy.py``. Semantics match:

* ``analyze_text``              — src/workflows/analyzer/profiler.py:20-223
  (content keywords, length defaults, heading/table/list detection,
  hierarchy depth, avg sentence length, weighted structure score)
* ``select_chunking_strategy``  — src/core/chunk/strategy_selector.py:18-92
  (ordered decision tree; priority: short < structured < technical-type <
  tables < structure score < long)

For transcript rows there is no filename, so the filename tier of document-
type detection (profiler.py:68-74) is driven by the optional ``source_name``
argument and otherwise skipped — content keywords and length defaults apply
unchanged.
"""

from __future__ import annotations

import re

_MD_HEADER_RE = re.compile(r"^(#{1,6})\s+", re.MULTILINE)
_NUM_SECTION_RE = re.compile(r"^(\d+(?:\.\d+)*)\.\s+", re.MULTILINE)
_HEADING_ANY_RES = (
    re.compile(r"^\s*#{1,6}\s+", re.MULTILINE),
    re.compile(r"^\s*\d+\.\s+", re.MULTILINE),
    re.compile(r"^\s*[A-Z][A-Z\s]+$", re.MULTILINE),
    re.compile(r"^\s*[IVX]+\.\s+", re.MULTILINE),
)
_LIST_RES = (
    re.compile(r"^\s*[-*•]\s+", re.MULTILINE),
    re.compile(r"^\s*\d+\.\s+", re.MULTILINE),
    re.compile(r"^\s*[a-z]\.\s+", re.MULTILINE),
)
_SENTENCE_SPLIT_RE = re.compile(r"[.!?]+")

RAPPORT_KEYWORDS = ("table des matières", "sommaire", "chapitre")
FICHE_KEYWORDS = ("caractéristiques", "spécifications", "paramètres")
ARTICLE_KEYWORDS = ("introduction", "conclusion", "résumé")


def detect_document_type(text: str, source_name: str = "") -> str:
    """Keyword/length document-type classifier."""
    name = source_name.lower()
    if name.endswith((".pdf", ".docx", ".doc")):
        if any(k in name for k in ("fiche", "spec", "manual", "guide")):
            return "fiche_technique"
        if any(k in name for k in ("rapport", "report", "analyse")):
            return "rapport"
        if any(k in name for k in ("article", "blog", "news")):
            return "article"
    lower = text.lower()
    if any(k in lower for k in RAPPORT_KEYWORDS):
        return "rapport"
    if any(k in lower for k in FICHE_KEYWORDS):
        return "fiche_technique"
    if any(k in lower for k in ARTICLE_KEYWORDS):
        return "article"
    if len(text) > 5000:
        return "rapport"
    if len(text) > 1000:
        return "article"
    return "document_court"


# Literal prescans (the measured kernel technique — CLAUDE.md perf facts):
# each `in` check is a memchr-cheap STRICT SUPERSET of its regex (the regex
# can only match if the literal is present), so skipping the regex when the
# literal is absent never changes a result. Same guards as the textops
# kernel tier (1.77× there).

def has_headings(text: str) -> bool:
    if "#" in text and _HEADING_ANY_RES[0].search(text):
        return True
    if "." in text and _HEADING_ANY_RES[1].search(text):
        return True
    if _HEADING_ANY_RES[2].search(text):
        return True
    # ^\s*[IVX]+\.\s+ ⇒ the char before '.' is I, V or X
    if (("I." in text or "V." in text or "X." in text)
            and _HEADING_ANY_RES[3].search(text)):
        return True
    return False


def has_tables(text: str) -> bool:
    score = text.count("|") + text.count("\t") + text.count("colonne") + text.count("ligne")
    return score > 5


def has_lists(text: str) -> bool:
    if (("-" in text or "*" in text or "•" in text)
            and _LIST_RES[0].search(text)):
        return True
    if "." in text and (_LIST_RES[1].search(text) or _LIST_RES[2].search(text)):
        return True
    return False


def hierarchy_depth(text: str) -> int:
    levels: set[int] = set()
    if "#" in text:
        levels.update(len(h) for h in _MD_HEADER_RE.findall(text))
    if "." in text:
        levels.update(len(s.split(".")) for s in _NUM_SECTION_RE.findall(text))
    return max(levels) if levels else 1


def avg_sentence_length(text: str) -> float:
    sentences = [s.strip() for s in _SENTENCE_SPLIT_RE.split(text) if s.strip()]
    if not sentences:
        return 0.0
    return sum(len(s) for s in sentences) / len(sentences)


def structure_score(profile: dict) -> float:
    score = 0.0
    if profile["hierarchy_depth"] >= 3:
        score += 0.4
    elif profile["hierarchy_depth"] >= 2:
        score += 0.2
    if profile["has_headings"]:
        score += 0.3
    if profile["has_tables"]:
        score += 0.2
    if profile["has_lists"]:
        score += 0.1
    if profile["length_tokens"] < 500:
        score -= 0.2
    if profile["length_tokens"] > 2000:
        score += 0.1
    return min(1.0, max(0.0, score))


def analyze_text(text: str, source_name: str = "", language: str | None = None) -> dict:
    """Full profile for strategy selection."""
    profile = {
        "type": detect_document_type(text, source_name),
        "lang": language or "unknown",
        "length_tokens": len(text) // 4,
        "length_chars": len(text),
        "has_headings": has_headings(text),
        "has_tables": has_tables(text),
        "hierarchy_depth": hierarchy_depth(text),
        "avg_sentence_length": avg_sentence_length(text),
        "has_lists": has_lists(text),
    }
    profile["structure_score"] = structure_score(profile)
    return profile


def select_strategy_for_text(text: str, source_name: str = "",
                             language: str | None = None) -> dict:
    """``select_chunking_strategy(analyze_text(...))`` with the profile
    computed lazily: the decision tree's FIRST branch keys on
    ``length_tokens`` (= len//4) alone, so documents under 4000 chars —
    the overwhelming majority of transcript turns — never pay the
    heading/table/hierarchy/sentence regex passes whose outputs the
    selection would ignore (r7; the fused adaptive hop's selection cost
    drops ~1s/8k turns). Longer documents fall through to the full
    profile — decisions are identical by construction."""
    if len(text) // 4 < 1000:
        return {"strategy": "recursive", "max_tokens": 300, "overlap": 30,
                "reason": "short_document"}
    return select_chunking_strategy(
        analyze_text(text, source_name, language))


def select_chunking_strategy(profile: dict) -> dict:
    """Ordered decision tree → {strategy, max_tokens, overlap, reason}."""
    if profile["length_tokens"] < 1000:
        return {"strategy": "recursive", "max_tokens": 300, "overlap": 30,
                "reason": "short_document"}
    if profile["has_headings"] and profile["hierarchy_depth"] >= 2:
        return {"strategy": "parent_child", "max_tokens": 400, "overlap": 50,
                "reason": "structured_document"}
    if profile["type"] in ("fiche_technique", "rapport"):
        return {"strategy": "semantic", "max_tokens": 500, "overlap": 60,
                "reason": "technical_document"}
    if profile["has_tables"]:
        return {"strategy": "late", "max_tokens": 300, "overlap": 50,
                "reason": "tabular_content"}
    if profile["structure_score"] > 0.6:
        return {"strategy": "parent_child", "max_tokens": 400, "overlap": 50,
                "reason": "high_structure_score"}
    if profile["length_tokens"] > 5000:
        return {"strategy": "semantic", "max_tokens": 600, "overlap": 80,
                "reason": "long_document"}
    return {"strategy": "recursive", "max_tokens": 400, "overlap": 50,
            "reason": "default_fallback"}


# --- ML strategy prediction (reference "auto" mode) --------------------------
#
# Reference: src/core/cli/commands/chunk.py:677-717 imports
# src.workflows.analyzer.strategy_selector.predict_best_strategy — a module
# absent from the reference repo, so its auto mode ALWAYS falls back to
# "semantic". We implement the advertised contract: (strategy, confidence)
# over the CLI's valid classes {semantic, sentence, token}, with the same
# fallback-on-failure. The model is a dependency-free multinomial logit with
# INTEGER-scaled weights over integer/boolean profile features: argmax of
# logits equals argmax of softmax, so dropping exp() keeps the decision —
# and the confidence ratio — bit-identical across Python, Spark SQL and
# DuckDB (the oracle contract).

ML_CLASSES = ("semantic", "sentence", "token")


def ml_strategy_scores(text: str) -> dict[str, int]:
    """Integer logit scores per class from profile features."""
    t = len(text) // 4
    b_short = 1 if t < 500 else 0
    b_mid = 1 if 500 <= t < 2000 else 0
    b_long = 1 if t >= 2000 else 0
    h = 1 if has_headings(text) else 0
    tb = 1 if has_tables(text) else 0
    ls = 1 if has_lists(text) else 0
    d = hierarchy_depth(text)
    return {
        # structure/length → semantic; mid-size prose → sentence; short → token
        "semantic": 3 * h + 2 * tb + 2 * d + 4 * b_long + ls,
        "sentence": 2 + 3 * b_mid + b_long,
        "token": 1 + 4 * b_short,
    }


def predict_best_strategy(text: str) -> tuple[str, float]:
    """(strategy, confidence); ties break in ML_CLASSES order."""
    scores = ml_strategy_scores(text)
    best = max(ML_CLASSES, key=lambda c: (scores[c], -ML_CLASSES.index(c)))
    total = sum(scores.values())
    return best, scores[best] / total if total > 0 else 0.0


def auto_strategy(text: str) -> tuple[str, float, str]:
    """Reference auto-mode semantics: ML prediction, 'semantic' on any
    failure (chunk.py:705-717). Returns (strategy, confidence, method)."""
    try:
        strategy, confidence = predict_best_strategy(text)
        return strategy, confidence, "ml_prediction"
    except Exception:  # noqa: BLE001 — mirror reference catch-all fallback
        return "semantic", 0.0, "fallback"


def validate_strategy_config(config: dict) -> bool:
    """Shape/range validation — strategy_selector.py:122-161."""
    required = ("strategy", "max_tokens", "overlap", "reason")
    if not all(k in config for k in required):
        return False
    if config["strategy"] not in ("recursive", "semantic", "parent_child", "late"):
        return False
    if not isinstance(config["max_tokens"], int) or config["max_tokens"] <= 0:
        return False
    if not isinstance(config["overlap"], int) or config["overlap"] < 0:
        return False
    if config["overlap"] >= config["max_tokens"]:
        return False
    return True
