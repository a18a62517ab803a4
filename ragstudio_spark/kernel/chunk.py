"""Chunk materialization kernel: split + span computation + metadata.

Semantics match the reference chunking entry points:

* strategy normalization (semantic/sentence → recursive; token/late/
  parent_child → token) — src/core/chunk/chunker.py:267-274
* preprocessing (extraction fixes, page numbers, whitespace) —
  src/core/chunk/langchain_chunker.py:191-201
* span computation with the find-from-running-position rule (first 50 chars
  searched from the running char position; -1 falls back to the running
  position) — src/core/chunk/langchain_chunker.py:221-231. This quirk is part
  of the per-turn equality contract and is replicated exactly.
* deterministic chunk ids ``md5(f"{source}:{idx}:{text[:100]}")[:12]`` —
  src/core/chunk/langchain_chunker.py:234-237
* token_count = len//4, sentence_count = count of ``[.!?]+`` runs —
  src/core/chunk/langchain_chunker.py:240-243
* adaptive mode (parent_child → heading split, else char-window) —
  src/core/chunk/chunker.py:164-230
"""

from __future__ import annotations

import hashlib
import re

from . import splitter, textops

_SENTENCE_RE = re.compile(r"[.!?]+")

#: Engine-facing strategy → actual splitter, per chunker.py:267-274.
_STRATEGY_MAP = {
    "semantic": "recursive",
    "sentence": "recursive",
    "recursive": "recursive",
    "token": "token",
    "late": "token",
    "parent_child": "token",
}


def normalize_strategy(requested: str) -> str:
    """Map a requested strategy name onto the executed splitter name."""
    return _STRATEGY_MAP.get(requested, "recursive")


def split_text(text: str, strategy: str, max_tokens: int, overlap: int,
               tokenizer=None) -> list[str]:
    """Dispatch to the splitter for an *actual* (already normalized)
    strategy. A ``tokenizer`` (kernel.bpe.BPETokenizer) upgrades the token
    strategy from the char-window fallback to true BPE token windows
    (reference primary path, src/core/chunk/chunker.py:58-73)."""
    if strategy == "recursive":
        return splitter.recursive_split(text, max_tokens=max_tokens, overlap=overlap)
    if strategy == "token":
        if tokenizer is not None:
            from . import bpe

            return bpe.bpe_split(text, max_tokens=max_tokens, overlap=overlap,
                                 tokenizer=tokenizer)
        return splitter.window_split(text, max_tokens=max_tokens, overlap=overlap)
    if strategy == "parent_child":
        return splitter.parent_child_split(text, max_tokens=max_tokens, overlap=overlap)
    return splitter.recursive_split(text, max_tokens=max_tokens, overlap=overlap)


def chunk_turn(
    text: str,
    source: str,
    requested_strategy: str = "recursive",
    max_tokens: int = 400,
    overlap: int = 50,
    do_preprocess: bool = True,
    adaptive: bool = False,
    with_base: bool = False,
    tokenizer=None,
) -> tuple[list[dict], dict] | tuple[list[dict], dict, str]:
    """Chunk one turn's text; returns (chunk dicts, preprocess stats).

    ``source`` plays the role of the reference's ``document.source_path`` in
    the deterministic chunk id (for transcripts: ``f"{conv_id}:{turn_idx}"``).

    In ``adaptive`` mode ``requested_strategy`` is executed via the adaptive
    dispatch (parent_child → heading split, anything else → char window),
    mirroring chunk_document_adaptive; otherwise the LangChain-parity mapping
    applies.

    ``with_base=True`` additionally returns the text the spans index into
    (the preprocessed text), so callers can ship spans instead of chunk
    strings and slice the text back engine-side (operators/fused.py).
    """
    if not text:
        empty: tuple = ([], {"extraction_fixes": 0, "page_numbers_removed": 0})
        return (*empty, "") if with_base else empty

    stats = {"extraction_fixes": 0, "page_numbers_removed": 0}
    text_to_chunk = text
    if do_preprocess:
        text_to_chunk, stats = textops.preprocess(text)

    if adaptive:
        actual = "parent_child" if requested_strategy == "parent_child" else "token"
    else:
        actual = normalize_strategy(requested_strategy)

    chunk_texts = split_text(text_to_chunk, actual, max_tokens, overlap,
                             tokenizer=tokenizer)
    if not chunk_texts:
        return ([], stats, text_to_chunk) if with_base else ([], stats)

    chunks: list[dict] = []
    char_position = 0
    total = len(chunk_texts)
    for idx, chunk_text in enumerate(chunk_texts):
        search_text = chunk_text[: min(50, len(chunk_text))]
        char_start = text_to_chunk.find(search_text, char_position)
        if char_start == -1:
            char_start = char_position
        char_end = char_start + len(chunk_text)

        chunk_id = hashlib.md5(
            f"{source}:{idx}:{chunk_text[:100]}".encode()
        ).hexdigest()[:12]

        chunks.append(
            {
                "chunk_index": idx,
                "chunk_id": f"chunk_{chunk_id}",
                "text": chunk_text,
                "char_start": char_start,
                "char_end": char_end,
                "char_length": len(chunk_text),
                "token_count": len(chunk_text) // 4,
                "sentence_count": len(_SENTENCE_RE.findall(chunk_text)),
                "total_chunks": total,
                "chunking_strategy": actual,
                "requested_strategy": requested_strategy,
                "chunk_size": max_tokens,
                "chunk_overlap": overlap,
            }
        )
        char_position = char_end
    return (chunks, stats, text_to_chunk) if with_base else (chunks, stats)


def validate_chunks(chunk_texts: list[str]) -> list[str]:
    """Quality report: short chunks, mid-word endings (first 10), exact
    duplicates — src/core/chunk/langchain_chunker.py:289-321."""
    issues: list[str] = []
    short = [c for c in chunk_texts if len(c) < 50]
    if short:
        issues.append(f"{len(short)} chunks < 50 chars")
    for i, c in enumerate(chunk_texts[:10]):
        if c and c[-1].isalpha():
            issues.append(f"Chunk {i} ends mid-word: '{c[-20:]}'")
    seen: set[str] = set()
    for i, c in enumerate(chunk_texts):
        h = hashlib.md5(c.encode()).hexdigest()
        if h in seen:
            issues.append(f"Duplicate chunk detected: {i}")
        seen.add(h)
    return issues
