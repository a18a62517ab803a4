"""Text splitting kernel.

``recursive_split`` is a from-scratch implementation of the well-known
recursive character splitting algorithm (as popularized by LangChain's
``RecursiveCharacterTextSplitter``; the algorithm is public and widely
documented). The reference engine configures it with ``chunk_size =
max_tokens*4`` chars, ``chunk_overlap = overlap*4`` chars, ``keep_separator=
True``, separators ``["\\n\\n", "\\n", ". ", "! ", "? ", "; ", ", ", " ", ""]``
and ``length_function=len`` (reference: src/core/chunk/langchain_chunker.py:
142-154) — those parameters are the defaults here.

``window_split`` matches the reference's char-window fallback chunker
(src/core/chunk/chunker.py:39-56, the tiktoken-less branch):
``window = max_tokens*4``, ``step = max(window - overlap*4, 1)``.

``split_by_headings`` / ``parent_child_split`` mirror
src/core/chunk/chunker.py:76-161.
"""

from __future__ import annotations

import re

DEFAULT_SEPARATORS: tuple[str, ...] = ("\n\n", "\n", ". ", "! ", "? ", "; ", ", ", " ", "")


def _split_keep_separator(text: str, separator: str) -> list[str]:
    """Split on ``separator`` keeping each separator attached to the *front*
    of the following piece (keep_separator="start" semantics)."""
    if separator == "":
        return [c for c in text]
    pattern = f"({re.escape(separator)})"
    raw = re.split(pattern, text)
    # raw = [piece0, sep, piece1, sep, piece2, ...]
    out = [raw[i] + raw[i + 1] for i in range(1, len(raw), 2)]
    if len(raw) % 2 == 0:
        out += raw[-1:]
    out = [raw[0]] + out
    return [s for s in out if s != ""]


def _join_pieces(pieces: list[str]) -> str | None:
    text = "".join(pieces).strip()
    return text if text else None


def _merge_splits(splits: list[str], chunk_size: int, chunk_overlap: int) -> list[str]:
    """Greedy merge of sub-chunk pieces into chunks ≤ chunk_size with a
    sliding overlap window (separator already attached to pieces)."""
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for piece in splits:
        plen = len(piece)
        if total + plen > chunk_size:
            if current:
                doc = _join_pieces(current)
                if doc is not None:
                    docs.append(doc)
                while total > chunk_overlap or (total + plen > chunk_size and total > 0):
                    total -= len(current[0])
                    current = current[1:]
        current.append(piece)
        total += plen
    doc = _join_pieces(current)
    if doc is not None:
        docs.append(doc)
    return docs


def _recursive_split(text: str, separators: list[str], chunk_size: int, chunk_overlap: int) -> list[str]:
    final_chunks: list[str] = []
    separator = separators[-1]
    remaining: list[str] = []
    for i, sep in enumerate(separators):
        if sep == "":
            separator = sep
            break
        if sep in text:
            separator = sep
            remaining = separators[i + 1 :]
            break

    splits = _split_keep_separator(text, separator)
    good: list[str] = []
    for s in splits:
        if len(s) < chunk_size:
            good.append(s)
        else:
            if good:
                final_chunks.extend(_merge_splits(good, chunk_size, chunk_overlap))
                good = []
            if not remaining:
                final_chunks.append(s)
            else:
                final_chunks.extend(_recursive_split(s, remaining, chunk_size, chunk_overlap))
    if good:
        final_chunks.extend(_merge_splits(good, chunk_size, chunk_overlap))
    return final_chunks


def recursive_split(
    text: str,
    max_tokens: int = 400,
    overlap: int = 50,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
) -> list[str]:
    """Recursive character split with the reference's 1 token ≈ 4 chars
    budget. Returns stripped, order-preserving chunk texts."""
    if not text:
        return []
    chunk_size = max_tokens * 4
    chunk_overlap = overlap * 4
    return _recursive_split(text, list(separators), chunk_size, chunk_overlap)


def window_split(text: str, max_tokens: int = 400, overlap: int = 50) -> list[str]:
    """Sliding char-window chunker (the reference's token-path fallback)."""
    if not text:
        return []
    window = max_tokens * 4
    step = max(window - overlap * 4, 1)
    return [text[i : i + window] for i in range(0, len(text), step)]


_HEADING_PATTERNS = [
    re.compile(r"^(#{1,6})\s+(.+)$"),          # markdown headers
    re.compile(r"^(\d+(?:\.\d+)*)\.\s+(.+)$"),  # numbered sections
    re.compile(r"^([A-Z][A-Z\s]+)$"),           # ALL CAPS lines
    re.compile(r"^([IVX]+\.\s+.+)$"),           # roman numerals
]


def split_by_headings(text: str) -> list[tuple[str, str]]:
    """Split into (heading, content) sections on heading-like lines."""
    sections: list[tuple[str, str]] = []
    current_heading = ""
    current_content: list[str] = []
    for line in text.split("\n"):
        stripped = line.strip()
        is_heading = False
        for pattern in _HEADING_PATTERNS:
            if pattern.match(stripped):
                if current_content:
                    sections.append((current_heading, "\n".join(current_content)))
                current_heading = stripped
                current_content = []
                is_heading = True
                break
        if not is_heading:
            current_content.append(line)
    if current_content:
        sections.append((current_heading, "\n".join(current_content)))
    return sections


def parent_child_split(text: str, max_tokens: int = 400, overlap: int = 50) -> list[str]:
    """Heading-sectioned chunking with the heading prepended as context to
    every chunk of its section; falls back to ``window_split`` when the
    document has no discernible structure."""
    sections = split_by_headings(text)
    if len(sections) <= 1:
        return window_split(text, max_tokens=max_tokens, overlap=overlap)
    chunks: list[str] = []
    for heading, content in sections:
        if not content.strip():
            continue
        for chunk_text in window_split(content, max_tokens=max_tokens, overlap=overlap):
            chunks.append(f"{heading}\n\n{chunk_text}" if heading else chunk_text)
    return chunks
