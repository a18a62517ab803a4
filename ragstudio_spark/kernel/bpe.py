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
        """Character offsets of every token boundary: [0, b1, ..., len]."""
        bounds = [0]
        pos = 0
        covered = 0
        for m in _PRETOKEN_RE.finditer(text):
            if m.start() > covered:  # defensive: pattern gap → 1 raw token
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


def load_merges(path: str) -> BPETokenizer:
    """Standard merges.txt: optional '#version' header, 'a b' per line."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(f"bad merges line: {line!r}")
            merges.append((parts[0], parts[1]))
    return BPETokenizer(merges)


@lru_cache(maxsize=4)
def tokenizer_from(path: str | None) -> BPETokenizer:
    """Process-wide tokenizer cache (one load per worker, not per row)."""
    return load_merges(path) if path else BPETokenizer()


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
