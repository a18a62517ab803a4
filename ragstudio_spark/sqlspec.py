"""Shared SQL-level specification of the readability predicate & friends.

The valid-word heuristic (reference: src/core/cli/utils/quality_check.py:
27-86) is fully expressible with regular expressions + array higher-order
functions, so the production Spark operator runs it JVM-side (whole-stage
codegen, no Python) and the DuckDB oracle runs the *same* formulas. This
module is the single source of truth for those formulas; both engines'
expressions are generated from it.

Rule equivalences (proved against the Python kernel in tests):
* digit+letter mix        → word matches both ``[0-9]`` and ``[letters]``
* mixed-case chaos        → for len≥4: (number of maximal single-case runs
                            − 1) > 2 — equals adjacent-pair transitions for
                            the pure-letter words that reach this rule
* ALL-CAPS>5              → ``^[UPPER]+$`` and len>5
* zero vowels             → no char of the reference's vowel string (which
                            deliberately omits uppercase accented vowels)
* >5 consonant run        → ``[consonants]{6,}`` (ASCII consonants only)
"""

from __future__ import annotations

# Exact character inventories from the reference (order irrelevant).
LOWER_ACCENTS = "éèêëàâäïîôöùûüÿæœ"
UPPER_ACCENTS = "ÉÈÊËÀÂÄÏÎÔÖÙÛÜŸÆŒ"
WORD_CLASS = f"[a-zA-Z0-9{LOWER_ACCENTS}{UPPER_ACCENTS}]+"
VOWEL_CLASS = f"[aeiouAEIOU{LOWER_ACCENTS}]"
CONSONANT_CLASS = "[bcdfghjklmnpqrstvwxyzBCDFGHJKLMNPQRSTVWXYZ]"
LETTER_CLASS = f"[a-zA-Z{LOWER_ACCENTS}{UPPER_ACCENTS}]"
LOWER_RUN = f"[a-z{LOWER_ACCENTS}]+"
UPPER_RUN = f"[A-Z{UPPER_ACCENTS}]+"
ALL_UPPER_RE = f"^[A-Z{UPPER_ACCENTS}]+$"


def valid_word_condition(w: str, engine: str) -> str:
    """SQL boolean expression: word ``w`` (len≥2) looks like a real word.

    ``engine`` ∈ {"spark", "duckdb"}; both dialects share almost everything,
    they differ only in the regex-match function name.
    """
    if engine == "spark":
        def matches(expr, pat):
            return f"{expr} RLIKE '{pat}'"
        def count_runs(expr):
            return f"size(regexp_extract_all({expr}, '{LOWER_RUN}|{UPPER_RUN}', 0))"
    elif engine == "duckdb":
        def matches(expr, pat):
            return f"regexp_matches({expr}, '{pat}')"
        def count_runs(expr):
            return f"len(regexp_extract_all({expr}, '{LOWER_RUN}|{UPPER_RUN}'))"
    else:
        raise ValueError(engine)

    # Fast path (prescan, same technique as the kernel's literal prescans):
    # a word that is pure lowercase letters of length ≤ 15 trivially passes
    # the digit-mix, case-chaos, length and ALL-CAPS rules (no digits, one
    # case run, bounded, not upper), so only the vowel and consonant-run
    # checks remain — 3 regex evaluations instead of 6 for the overwhelming
    # majority of words. The slow chain is the proven-equivalent full rule
    # set; both engines get the same shape so the oracle compares the same
    # formula against itself.
    lower_simple = "^[a-z" + LOWER_ACCENTS + "]{1,15}$"
    fast = (
        f"{matches(w, VOWEL_CLASS)} "
        f"AND NOT {matches(w, CONSONANT_CLASS + '{6,}')}"
    )
    slow = (
        f"NOT ({matches(w, '[0-9]')} AND {matches(w, LETTER_CLASS)}) "
        f"AND NOT (length({w}) >= 4 AND {count_runs(w)} - 1 > 2) "
        f"AND length({w}) <= 15 "
        f"AND NOT ({matches(w, ALL_UPPER_RE)} AND length({w}) > 5) "
        f"AND {fast}"
    )
    return f"IF({matches(w, lower_simple)}, {fast}, {slow})"


def readability_exprs(text_col: str, engine: str, min_ratio: float = 0.4) -> dict[str, str]:
    """SQL expressions for (valid_word_ratio, is_readable) over ``text_col``.

    Mirrors check_text_quality (quality_check.py:89-179): unreadable when
    empty / whitespace-only / <20 non-space chars / no analyzable (len≥2)
    words / ratio below ``min_ratio``.
    """
    if engine == "spark":
        words = f"filter(regexp_extract_all({text_col}, '{WORD_CLASS}', 0), w -> length(w) >= 2)"
        valid = valid_word_condition("w", "spark")
        n_words = f"size({words})"
        n_valid = f"size(filter({words}, w -> {valid}))"
        no_space_len = f"length(translate({text_col}, ' \\n\\t', ''))"
    else:
        words = (
            f"list_filter(regexp_extract_all({text_col}, '{WORD_CLASS}'), "
            f"w -> length(w) >= 2)"
        )
        valid = valid_word_condition("w", "duckdb")
        n_words = f"len({words})"
        n_valid = f"len(list_filter({words}, w -> {valid}))"
        no_space_len = (
            f"length(replace(replace(replace({text_col}, ' ', ''), chr(10), ''), chr(9), ''))"
        )

    ratio = (
        f"CASE WHEN {n_words} = 0 THEN 0.0 "
        f"ELSE CAST({n_valid} AS DOUBLE) / {n_words} END"
    )
    is_readable = (
        f"({text_col} IS NOT NULL AND {no_space_len} >= 20 "
        f"AND {n_words} > 0 AND ({ratio}) >= {min_ratio})"
    )
    return {"valid_word_ratio": ratio, "is_readable": is_readable,
            "words": words, "n_words": n_words, "n_valid": n_valid}


def readable_fold_expr(text_col: str, min_ratio: float) -> str:
    """Spark-only single-pass form of ``is_readable``: one ``aggregate()``
    walks the word list once, accumulating (n_words, n_valid) and finishing
    into the readability boolean. Semantically identical to the expression
    from ``readability_exprs`` — same WORD_CLASS / len≥2 filter / 20
    no-space-char floor / ratio rule, same constants — but Catalyst cannot
    inline-duplicate the expensive word extraction, because every
    reference lives inside a single fold. Used on hot paths that evaluate
    the predicate per array element (the chunk quality gate)."""
    valid = valid_word_condition("w", "spark")
    return f"""aggregate(
  filter(regexp_extract_all({text_col}, '{WORD_CLASS}', 0), w -> length(w) >= 2),
  named_struct('n', 0, 'v', 0),
  (acc, w) -> named_struct('n', acc.n + 1, 'v', acc.v + IF({valid}, 1, 0)),
  acc -> ({text_col} IS NOT NULL
          AND length(translate({text_col}, ' \\n\\t', '')) >= 20
          AND acc.n > 0
          AND CAST(acc.v AS DOUBLE) / acc.n >= {min_ratio}))"""
