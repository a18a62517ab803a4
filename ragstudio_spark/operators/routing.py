"""Routing analyzers — engine-selection scoring as pure column expressions.

Text-payload ports of the reference's §2.6 routing tier (the CV engines
themselves are out of scope; the *scoring/routing semantics* are kept):

* ``math_content_cols`` / scientific detector — src/workflows/analyzer/
  scientific_detector.py:48-93,235-303: math-symbol count, equation-pattern
  count, keyword presence count; ``math_score = (sym*0.1 + eq*0.05 +
  kw*0.02) / max(len/1000, 1)`` capped at 1; scientific when score*0.4 ≥
  0.15; engine ladder nougat (>0.7) / qwen_vl (>0.4) / classic_ocr.
* ``multilingual_score`` — complexity.py:370-382: ``min(1, non_ascii*2 +
  french_chars*3)`` ratios.
* ``complexity_cols`` — complexity.py:384-433: weighted factors (0.25 OCR
  confidence, 0.20 layout, 0.15 image density, 0.15 table density, 0.10
  multilingual, 0.10 low-confidence ratio, 0.05 size), strategy ladder
  classic_ocr (<0.4) / minicpm_v (<0.7) / qwen_vl. For text payloads the
  CV-only factors are derived from text evidence (documented per factor).
* ``quality_category`` — ocr_quality_detector.py:160-615: HIGH ≥0.7 /
  MEDIUM ≥0.4 / LOW, with the dictionary-ratio override forcing LOW below
  0.30 (dictionary ratio = the valid-word ratio, same machinery as the
  readability gate).
* ``with_routing`` also emits the OCRRouter-style audit column
  ``routing_decisions: array<struct<step,score,decision>>``
  (ocr_router.py:112-250).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ragstudio_spark import sqlspec

MATH_SYMBOLS = "√π θ∫∑∏∞±≤≥≠≈∈∉∪∩⊂⊃→↔αβγδεζηλμνξρστφχψωΔ∇∂ℜℑℵ".replace(" ", "")
EQUATION_PATTERNS = (
    r"[a-zA-Z]²", r"[a-zA-Z]³", r"[a-zA-Z]ⁿ", r"[a-zA-Z]₀", r"[a-zA-Z]₁",
    r"[a-zA-Z]₂", r"[a-zA-Z]₃", r"[a-zA-Z]ₙ", r"[0-9]+/[0-9]+",
    r"[a-zA-Z]+\([^)]+\)", r"[0-9]+\.[0-9]+",
    r"[a-zA-Z]+²\s*[+\-]\s*[a-zA-Z]+²", r"[a-zA-Z]+\s*[+\-×÷]\s*[a-zA-Z]+",
    r"[a-zA-Z]+\s*=\s*[a-zA-Z0-9]+", r"[a-zA-Z]+\s*[<>≤≥]\s*[a-zA-Z0-9]+",
)
SCIENTIFIC_KEYWORDS = (
    "équation", "fonction", "dérivée", "intégrale", "limite", "théorème",
    "démonstration", "matrice", "vecteur", "polynôme", "probabilité",
    "physique", "chimie", "thermodynamique", "formule", "calculer",
)
FRENCH_CHARS = "àâäéèêëïîôöùûüÿç"

MATH_SYMBOL_WEIGHT = 0.1
EQUATION_WEIGHT = 0.05
KEYWORD_WEIGHT = 0.02
MIN_MATH_SCORE = 0.15


def _count_re(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def math_content_cols(text: Column) -> dict[str, Column]:
    symbol_count = _count_re(text, f"[{MATH_SYMBOLS}]")
    equation_count = None
    for pat in EQUATION_PATTERNS:
        c = _count_re(text, pat)
        equation_count = c if equation_count is None else equation_count + c
    keyword_count = None
    lower = F.lower(text)
    for kw in SCIENTIFIC_KEYWORDS:
        c = F.when(lower.contains(kw), 1).otherwise(0)
        keyword_count = c if keyword_count is None else keyword_count + c
    denom = F.greatest(F.length(text) / 1000.0, F.lit(1.0))
    math_score = F.least(
        (symbol_count * MATH_SYMBOL_WEIGHT + equation_count * EQUATION_WEIGHT
         + keyword_count * KEYWORD_WEIGHT) / denom,
        F.lit(1.0),
    )
    return {
        "math_symbols_count": symbol_count,
        "equations_count": equation_count,
        "keywords_count": keyword_count,
        "math_score": math_score,
    }


def scientific_cols(
    math_score: Column,
    image_text_ratio: Column | None = None,
    ocr_coverage: Column | None = None,
    file_size_mb: Column | None = None,
) -> dict[str, Column]:
    """Full scientific score (scientific_detector.py:272-303): math term ×
    0.4 plus structural indicators (+0.3 image ratio > 0.6, +0.2 coverage <
    0.8, +0.1 size > 5 MB). For bare text payloads the indicators default
    to no-signal values (0 / 1.0 / 0) and only the math term contributes —
    which caps the score at 0.4, so the nougat branch needs structural
    evidence, exactly as in the reference."""
    image_text_ratio = image_text_ratio if image_text_ratio is not None else F.lit(0.0)
    ocr_coverage = ocr_coverage if ocr_coverage is not None else F.lit(1.0)
    file_size_mb = file_size_mb if file_size_mb is not None else F.lit(0.0)
    score = F.least(
        math_score * 0.4
        + F.when(image_text_ratio > 0.6, 0.3).otherwise(0.0)
        + F.when(ocr_coverage < 0.8, 0.2).otherwise(0.0)
        + F.when(file_size_mb > 5.0, 0.1).otherwise(0.0),
        F.lit(1.0),
    )
    is_scientific = score >= MIN_MATH_SCORE
    engine = (
        F.when(is_scientific & (score > 0.7), F.lit("nougat"))
        .when(is_scientific & (score > 0.4), F.lit("qwen_vl"))
        .otherwise(F.lit("classic_ocr"))
    )
    return {"scientific_score": score, "is_scientific": is_scientific,
            "scientific_engine": engine}


def multilingual_score(text: Column) -> Column:
    total = F.greatest(F.length(text), F.lit(1))
    ascii_chars = F.length(F.regexp_replace(text, r"[^\x00-\x7F]", ""))
    non_ascii_ratio = (total - ascii_chars).cast("double") / total
    french = F.length(text) - F.length(F.translate(text, FRENCH_CHARS, ""))
    french_ratio = french.cast("double") / total
    return F.least(F.lit(1.0), non_ascii_ratio * 2 + french_ratio * 3)


def complexity_cols(text: Column, valid_word_ratio: Column) -> dict[str, Column]:
    """Weighted complexity score over text-derivable factors. Factor →
    text evidence mapping (CV factors have no signal in a text payload):
      ocr_confidence      → valid-word ratio ×100 (dictionary confidence)
      layout_complexity   → line-structure irregularity: short-line ratio
      image_density       → 0 (no pixels in a text payload)
      table_density       → table-rule chars per 100 chars, capped at 1
      multilingual        → complexity.py:370-382 formula verbatim
      low_confidence      → 1 − valid-word ratio
      file_size           → chars/40960 (≈10 MB of text → 1.0), capped
    """
    confidence_factor = F.greatest(
        F.lit(0.0), (100.0 - valid_word_ratio * 100.0) / 100.0
    )
    short_lines = F.size(
        F.filter(F.split(text, "\n"), lambda ln: F.length(ln) < 20)
    )
    total_lines = F.greatest(F.size(F.split(text, "\n")), F.lit(1))
    layout = short_lines.cast("double") / total_lines
    table_chars = F.length(text) - F.length(F.translate(text, "|\t", ""))
    table_density = F.least(
        table_chars.cast("double") / F.greatest(F.length(text) / 100.0, F.lit(1.0)),
        F.lit(1.0),
    )
    multi = multilingual_score(text)
    low_conf = F.lit(1.0) - valid_word_ratio
    size_factor = F.least(F.lit(1.0), F.length(text) / 40960.0)

    score = F.least(
        F.lit(1.0),
        confidence_factor * 0.25 + layout * 0.20 + F.lit(0.0) * 0.15
        + table_density * 0.15 + multi * 0.10 + low_conf * 0.10
        + size_factor * 0.05,
    )
    strategy = (
        F.when(score < 0.4, F.lit("classic_ocr"))
        .when(score < 0.7, F.lit("minicpm_v"))
        .otherwise(F.lit("qwen_vl"))
    )
    return {"complexity_score": score, "complexity_strategy": strategy,
            "layout_complexity": layout, "table_density": table_density,
            "multilingual_score": multi}


def quality_category(score: Column, dictionary_ratio: Column,
                     dict_threshold: float = 0.30) -> Column:
    """HIGH/MEDIUM/LOW with the dictionary-ratio LOW override."""
    return (
        F.when(dictionary_ratio < dict_threshold, F.lit("LOW"))
        .when(score >= 0.7, F.lit("HIGH"))
        .when(score >= 0.4, F.lit("MEDIUM"))
        .otherwise(F.lit("LOW"))
    )


def pdf_type_cols(text: Column, sample_blocks: int = 5,
                  min_chars: int = 100) -> dict[str, Column]:
    """Document-type detector (document_detector.py:94-211) on text
    payloads: the reference samples ≤5 pages and classifies by the ratio of
    pages with ≥100 extractible chars (≥0.8 TEXT_BASED, ≤0.2 SCANNED, else
    HYBRID). Pages → paragraph blocks for a text payload."""
    blocks = F.filter(
        F.split(text, r"\n\n"),
        lambda b: F.length(F.regexp_replace(b, F.lit(r"^\s+|\s+$"), F.lit(""))) > 0,
    )
    sampled = F.slice(blocks, 1, sample_blocks)
    n = F.size(sampled)
    extractible = F.size(F.filter(sampled, lambda b: F.length(b) >= min_chars))
    ratio = F.when(n > 0, extractible.cast("double") / n).otherwise(F.lit(0.0))
    doc_type = (
        F.when(n == 0, F.lit("EMPTY"))
        .when(ratio >= 0.8, F.lit("TEXT_BASED"))
        .when(ratio <= 0.2, F.lit("SCANNED"))
        .otherwise(F.lit("HYBRID"))
    )
    return {"extractible_ratio": ratio, "pdf_doc_type": doc_type,
            "sampled_blocks": n}


def with_routing(
    df: DataFrame,
    text_col: str = "text",
    image_text_ratio: Column | None = None,
    ocr_coverage: Column | None = None,
    file_size_mb: Column | None = None,
) -> DataFrame:
    """Attach all routing columns + the routing_decisions audit array."""
    text = F.col(text_col)
    spec = sqlspec.readability_exprs(text_col, "spark", min_ratio=0.4)
    vwr = F.expr(spec["valid_word_ratio"])

    math = math_content_cols(text)
    for name, col in math.items():
        df = df.withColumn(name, col)
    sci = scientific_cols(F.col("math_score"), image_text_ratio, ocr_coverage,
                          file_size_mb)
    for name, col in sci.items():
        df = df.withColumn(name, col)
    df = df.withColumn("valid_word_ratio", vwr)
    comp = complexity_cols(text, F.col("valid_word_ratio"))
    for name, col in comp.items():
        df = df.withColumn(name, col)
    df = df.withColumn(
        "quality_category",
        quality_category(F.col("valid_word_ratio"), F.col("valid_word_ratio")),
    )
    # OCRRouter-style audit trail (ocr_router.py 4-step routing)
    return df.withColumn(
        "routing_decisions",
        F.array(
            F.struct(F.lit("quality_test").alias("step"),
                     F.col("valid_word_ratio").alias("score"),
                     F.col("quality_category").alias("decision")),
            F.struct(F.lit("scientific_detect").alias("step"),
                     F.col("scientific_score").alias("score"),
                     F.col("scientific_engine").alias("decision")),
            F.struct(F.lit("complexity").alias("step"),
                     F.col("complexity_score").alias("score"),
                     F.col("complexity_strategy").alias("decision")),
        ),
    )
