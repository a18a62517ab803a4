"""Dependency-free BPE tokenizer for the token splitting strategy.

The reference's primary token path encodes with tiktoken and windows the
token ids (src/core/chunk/chunker.py:58-73: ``step = max(max_tokens -
overlap, 1)``, decode each slice; configured via TokenTextSplitter,
src/core/chunk/langchain_chunker.py:156-161). tiktoken is not in this
container, so this module implements the same contract with a pure-Python
byte-pair-encoding tokenizer:

* ``load_merges(path)`` reads a standard ``merges.txt`` (one space-
  separated pair per line, rank = line order, optional ``#version``
  header) — drop in a real vocabulary when one is available;
* without a file, a small embedded merge table (common English/French
  digraphs) provides a deterministic fallback vocabulary;
* tokens never cross pre-token boundaries (a GPT-2-style word/punct/space
  pre-tokenizer) and merges operate on characters, so every token boundary
  is a character offset — a window of tokens IS a substring of the text
  and decode is slicing, lossless by construction.

The splitter entry (``bpe_split``) mirrors the reference loop shape
exactly: windows of ``max_tokens`` tokens advancing by ``max(max_tokens -
overlap, 1)``. The char-window fallback (kernel/splitter.py:117-123)
remains the default when no tokenizer is configured — the oracle-gated
``window_chunks_sql`` path is unchanged.
"""

from __future__ import annotations

import re
from functools import lru_cache
from itertools import accumulate

# GPT-2-style pre-tokenization (public pattern, simplified to stdlib `re`:
# contractions, space-prefixed words, space-prefixed punctuation runs,
# whitespace runs)
_PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+")

#: embedded fallback merge table — deterministic, tiny, documented; a real
#: deployment loads a merges file instead
EMBEDDED_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "n"), ("e", "n"), ("r", "e"), ("o", "u"), ("in", "g"),
    ("a", "t"), ("e", "s"), ("o", "r"), ("t", "i"), ("l", "e"),
    ("d", "e"), ("s", "t"), ("an", "d"), ("q", "u"), ("qu", "e"),
    ("a", "i"), ("e", "u"), ("c", "h"), ("s", "i"), ("en", "t"),
    ("m", "ent"),
)


class BPETokenizer:
    """Character-level BPE over pre-tokenized pieces."""

    def __init__(self, merges: list[tuple[str, str]] | tuple = EMBEDDED_MERGES):
        self.ranks: dict[tuple[str, str], int] = {
            tuple(p): i for i, p in enumerate(merges)}
        self._cache: dict[str, tuple[str, ...]] = {}
        # piece → tuple of token LENGTHS (what token_boundaries actually
        # consumes — caching the derived form removes the per-token
        # _bpe/len work from the hot path; the pipeline profile put 57%
        # of chunk_turn in this function, r7)
        self._lengths: dict[str, tuple[int, ...]] = {}

    def _bpe(self, piece: str) -> tuple[str, ...]:
        cached = self._cache.get(piece)
        if cached is not None:
            return cached
        word = list(piece)
        ranks = self.ranks
        while len(word) >= 2:
            best_rank = None
            best_pair = None
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, p
            if best_pair is None:
                break
            a, b = best_pair
            merged: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        out = tuple(word)
        if len(self._cache) < 65536:
            self._cache[piece] = out
        return out

    def token_boundaries(self, text: str) -> list[int]:
        """Character offsets of every token boundary: [0, b1, ..., len].

        The hot path is two C loops: the piece stream comes from
        ``findall`` (no match objects — the pre-token alternatives cover
        every character class, so pieces tile the text; the one-pass
        length check guards the theoretical gap case and falls back to
        the positional loop), per-piece token-length tuples come from the
        ``_lengths`` cache and concatenate via ``list.extend``, and the
        cumulative sum runs once through ``itertools.accumulate``.
        Byte-identical to the naive loop — bounds = [0, Σd₁, Σd₂, …] is
        exactly the per-token position walk."""
        pieces = _PRETOKEN_RE.findall(text)
        if sum(map(len, pieces)) != len(text):
            return self._token_boundaries_positional(text)
        deltas: list[int] = []
        extend = deltas.extend
        lengths = self._lengths
        for piece in pieces:
            d = lengths.get(piece)
            if d is None:
                d = tuple(len(tok) for tok in self._bpe(piece))
                if len(lengths) < 65536:
                    lengths[piece] = d
            extend(d)
        bounds = [0]
        bounds.extend(accumulate(deltas))
        return bounds

    def _token_boundaries_positional(self, text: str) -> list[int]:
        """The defensive positional form, used only when the pre-token
        pieces do not tile the text (a pattern gap becomes 1 raw token)."""
        bounds = [0]
        pos = 0
        covered = 0
        for m in _PRETOKEN_RE.finditer(text):
            if m.start() > covered:
                pos += m.start() - covered
                bounds.append(pos)
            for tok in self._bpe(m.group()):
                pos += len(tok)
                bounds.append(pos)
            covered = m.end()
        if covered < len(text):
            bounds.append(len(text))
        return bounds

    def encode_len(self, text: str) -> int:
        return len(self.token_boundaries(text)) - 1


_ESCAPE_RE = re.compile(r"\\\\|\\u[0-9a-fA-F]{4}")


def escape_merge_token(tok: str) -> str:
    """Whitespace-safe merges.txt token: backslash → ``\\\\``, every
    whitespace char and ``#`` → ``\\uXXXX``. The GPT-2-style
    pre-tokenizer makes space-prefixed pieces dominant, so top trained
    merges like ``(' ', 't')`` are near-certain on real corpora — written
    raw they would corrupt the space-separated line format (and newline
    tokens the file itself). ``#`` must be escaped too: a merge like
    ``('#', '#')`` (markdown headings) would otherwise serialize to a
    line the comment-skipping parser silently drops, shifting every later
    merge's rank (review-found, reproduced). All escaped chars are in the
    BMP, so 4 hex digits suffice."""
    out = tok.replace("\\", "\\\\")
    return "".join(f"\\u{ord(c):04x}" if (c.isspace() or c == "#") else c
                   for c in out)


def unescape_merge_token(tok: str) -> str:
    return _ESCAPE_RE.sub(
        lambda m: "\\" if m.group() == "\\\\" else chr(int(m.group()[2:], 16)),
        tok)


def parse_merges(lines) -> list[tuple[str, str]]:
    """merges.txt lines → ordered merge list (shared by file and packaged-
    resource loading).

    The ``escape_merge_token`` escapes are a ragstudio-format feature,
    identified by the ``#version: ragstudio_spark …`` header that
    ``save_merges`` writes as its first line. Files without that header
    (externally trained GPT-2-style vocabularies) parse their tokens RAW:
    code-corpus pieces routinely contain literal ``\\\\`` or ``\\uXXXX``
    substrings (Windows paths, JSON escapes) that unconditional unescaping
    would silently rewrite into different pieces (review-found)."""
    merges: list[tuple[str, str]] = []
    unescape: bool | None = None  # decided by the first non-empty line
    for line in lines:
        line = line.rstrip("\n")
        if unescape is None and line:
            unescape = line.startswith("#version:") and "ragstudio" in line
        if not line or line.startswith("#"):
            continue
        parts = line.split(" ")
        if len(parts) != 2:
            raise ValueError(f"bad merges line: {line!r}")
        if unescape:
            merges.append((unescape_merge_token(parts[0]),
                           unescape_merge_token(parts[1])))
        else:
            merges.append((parts[0], parts[1]))
    return merges


def load_merges(path: str) -> BPETokenizer:
    """Standard merges.txt: optional '#version' header, 'a b' per line.
    Tokens carry the ``escape_merge_token`` escapes only when the
    ``#version: ragstudio_spark …`` header identifies the file as one
    save_merges wrote; headerless / foreign files parse raw (see
    parse_merges)."""
    with open(path, encoding="utf-8") as f:
        return BPETokenizer(parse_merges(f))


@lru_cache(maxsize=1)
def default_tokenizer() -> BPETokenizer | None:
    """Tokenizer from the SHIPPED trained vocabulary
    (ragstudio_spark/data/merges.txt — produced once by
    operators/bpe_trainer.py over the synthetic corpus, see
    scripts/train_bpe.py), or None when the artifact is absent (the
    char-window fallback then applies, the reference's own degradation
    path without tiktoken). Loaded via importlib.resources so the
    ``spark-submit --py-files ragstudio_spark.zip`` deployment finds it
    inside the zip; cached once per worker process."""
    try:
        from importlib.resources import files

        ref = files("ragstudio_spark").joinpath("data", "merges.txt")
        text = ref.read_text(encoding="utf-8")
    except Exception:
        return None
    return BPETokenizer(parse_merges(text.splitlines()))


@lru_cache(maxsize=4)
def tokenizer_from(path: str | None) -> BPETokenizer:
    """Process-wide tokenizer cache (one load per worker, not per row)."""
    return load_merges(path) if path else BPETokenizer()


def resolve_tokenizer(merges_path: str | None) -> BPETokenizer | None:
    """The ``bpe_merges_path`` contract, resolved in the WORKER process
    (a driver-side path is meaningless under a zip deployment):

    * ``"auto"`` (the pipeline default) — the shipped trained vocabulary,
      or None (char-window fallback) when no artifact is packaged;
    * ``None`` / ``""`` / ``"none"`` / ``"window"`` — explicitly no
      tokenizer: the char-window fallback (the string forms exist for
      config layers that cannot express literal None; empty string means
      "unset", matching the pre-"auto" truthiness contract — it must not
      silently activate the embedded fallback table);
    * anything else — a merges.txt path, loaded once per worker.
    """
    if merges_path == "auto":
        return default_tokenizer()
    if not merges_path or merges_path in ("none", "window"):
        return None
    return tokenizer_from(merges_path)


def bpe_split(text: str, max_tokens: int = 400, overlap: int = 50,
              tokenizer: BPETokenizer | None = None) -> list[str]:
    """Token windows, the reference loop shape (chunker.py:66-73):
    slice [start : start+max_tokens] advancing by max(max_tokens-overlap, 1),
    each slice decoded — here, a character-span substring."""
    if not text:
        return []
    tok = tokenizer or tokenizer_from(None)
    b = tok.token_boundaries(text)
    n = len(b) - 1
    if n <= 0:
        return []
    step = max(max_tokens - overlap, 1)
    return [text[b[s]: b[min(s + max_tokens, n)]] for s in range(0, n, step)]
