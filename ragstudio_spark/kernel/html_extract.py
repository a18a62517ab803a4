"""Readability-style HTML main-content extraction (from scratch, stdlib only).

The reference delegates HTML extraction to ``UnstructuredHTMLLoader(mode=
"elements")`` and joins element texts with ``"\\n\\n"`` (reference:
src/workflows/ingest/langchain_loader.py:77-96,196). This module implements
that capability natively as a boilerplate-stripping block extractor driven by
the two classic readability heuristics:

* **link density**  — ratio of characters inside ``<a>`` to all characters of
  a block; navigation/menus/footers score high and are dropped.
* **text density**  — blocks below a minimum direct-text length are noise
  unless they are headings.

plus structural boilerplate removal (``<nav> <header> <footer> <aside>``,
``script/style``, and class/id hints like ``sidebar``/``menu``/``cookie``).

Pure function of the input string; deterministic; no network, no DOM library
— a small stack machine over ``html.parser`` suitable for running vectorized
inside an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "li", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "figcaption",
}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "title"}
SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe", "head"}
BOILERPLATE_TAGS = {"nav", "header", "footer", "aside", "form", "button"}
_BOILERPLATE_HINT_RE = re.compile(
    r"(?:^|[\s_-])(nav|navbar|menu|footer|header|sidebar|side-bar|banner|"
    r"breadcrumb|crumb|comment|widget|cookie|consent|advert|ads?|promo|"
    r"social|share|related|pagination)(?:$|[\s_-])",
    re.IGNORECASE,
)
_WS_RE = re.compile(r"\s+")

MAX_LINK_DENSITY = 0.33
MIN_BLOCK_CHARS = 25


class _Block:
    __slots__ = ("tag", "parts", "link_chars", "order")

    def __init__(self, tag: str, order: int):
        self.tag = tag
        self.parts: list[str] = []
        self.link_chars = 0
        self.order = order

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.parts)).strip()


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._block_stack: list[_Block] = []
        self._skip_depth = 0
        self._boiler_root: str | None = None  # tag that opened boilerplate
        self._boiler_nest = 0                 # same-tag nesting inside it
        self._link_depth = 0
        self._order = 0

    @property
    def _in_boiler(self) -> bool:
        return self._boiler_root is not None

    @staticmethod
    def _is_boilerplate(tag: str, attrs: list[tuple[str, str | None]]) -> bool:
        if tag in BOILERPLATE_TAGS:
            return True
        for name, value in attrs:
            if name in ("class", "id", "role") and value:
                if name == "role" and value.lower() in (
                    "navigation", "banner", "contentinfo", "complementary",
                ):
                    return True
                if name != "role" and _BOILERPLATE_HINT_RE.search(value):
                    return True
        return False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if self._in_boiler:
            if tag == self._boiler_root:
                self._boiler_nest += 1
            return
        if self._is_boilerplate(tag, attrs):
            self._boiler_root = tag
            self._boiler_nest = 0
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS or tag == "title":
            block = _Block(tag, self._order)
            self._order += 1
            self.blocks.append(block)
            self._block_stack.append(block)

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if self._in_boiler:
            # close only on the tag that opened the boilerplate subtree,
            # counting same-tag nesting inside it
            if tag == self._boiler_root:
                if self._boiler_nest:
                    self._boiler_nest -= 1
                else:
                    self._boiler_root = None
            return
        if tag == "a" and self._link_depth:
            self._link_depth -= 1
        if (tag in BLOCK_TAGS or tag == "title") and self._block_stack:
            for i in range(len(self._block_stack) - 1, -1, -1):
                if self._block_stack[i].tag == tag:
                    del self._block_stack[i:]
                    break

    def handle_data(self, data: str) -> None:
        if self._skip_depth or self._in_boiler or not data:
            return
        if not self._block_stack:
            return
        block = self._block_stack[-1]
        block.parts.append(data)
        if self._link_depth:
            block.link_chars += len(data.strip())


def extract_main_content(html: str) -> str:
    """Strip boilerplate; return main-content block texts joined by
    ``"\\n\\n"`` in document order. Non-HTML input degrades gracefully
    (parser treats it as one text run outside any block → returns '')."""
    if not html:
        return ""
    parser = _Extractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # malformed beyond html.parser tolerance: fall back to tag-strip
        return _WS_RE.sub(" ", re.sub(r"<[^>]+>", " ", html)).strip()

    kept: list[str] = []
    for block in parser.blocks:
        text = block.text
        if not text:
            continue
        if block.tag == "title":
            continue
        text_len = len(text)
        link_density = block.link_chars / text_len if text_len else 1.0
        if link_density > MAX_LINK_DENSITY:
            continue
        if block.tag in HEADING_TAGS:
            kept.append(text)
        elif text_len >= MIN_BLOCK_CHARS:
            kept.append(text)
    return "\n\n".join(kept)
