"""Block-level HTML main-content extractor.

Algorithm (frozen contract, goldens generated against it):

1. Lex tags/text with a linear scanner; drop ``<script>``, ``<style>``,
   ``<noscript>``, ``<template>`` contents and comments/doctype.
2. Segment text into blocks at block-level tag boundaries.
3. A block is MAIN CONTENT iff:
   - no ancestor is ``nav/header/footer/aside/form``, and
   - word count >= MIN_WORDS, and
   - link density (chars inside <a> / total chars) <= MAX_LINK_DENSITY.
4. Output = kept block texts joined by '\\n'; each block's text is
   whitespace-collapsed and stripped; basic entities decoded.

Returns (main_text, spans) where spans are (start, end) character
offsets of each kept block within the returned text (the north star's
"character-span offsets per url").
"""

from __future__ import annotations

import re
from typing import List, Tuple

MIN_WORDS = 5
MAX_LINK_DENSITY = 0.33

BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html",
    "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
    "td", "tfoot", "th", "thead", "tr", "ul",
}
DROP_CONTENT_TAGS = {"script", "style", "noscript", "template", "svg", "head", "title"}
BOILERPLATE_ANCESTORS = {"nav", "header", "footer", "aside", "form"}
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "mdash": "—", "ndash": "–", "hellip": "…",
    "copy": "©", "reg": "®", "trade": "™", "euro": "€",
}

_TAG_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<!DOCTYPE[^>]*>|</?([a-zA-Z][a-zA-Z0-9-]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*)>",
    re.DOTALL,
)
_ENT_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z]+);")
_WS_RE = re.compile(r"\s+")


def _decode_entities(s: str) -> str:
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e.startswith("#x") or e.startswith("#X"):
            try:
                return chr(int(e[2:], 16))
            except ValueError:
                return m.group(0)
        if e.startswith("#"):
            try:
                return chr(int(e[1:]))
            except ValueError:
                return m.group(0)
        return _ENTITIES.get(e, m.group(0))

    return _ENT_RE.sub(sub, s)


class _Block:
    __slots__ = ("chars", "link_chars", "boiler_depth")

    def __init__(self, boiler_depth: int):
        self.chars: List[str] = []
        self.link_chars = 0
        self.boiler_depth = boiler_depth

    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.chars)).strip()


def extract_main_text(html: str) -> Tuple[str, List[Tuple[int, int]]]:
    """Extract main content text and per-block character spans."""
    blocks: List[_Block] = []
    cur = _Block(0)
    boiler_depth = 0
    link_depth = 0
    drop_until: str | None = None
    pos = 0
    n = len(html)

    def flush():
        nonlocal cur
        if cur.chars:
            blocks.append(cur)
        cur = _Block(boiler_depth)

    for m in _TAG_RE.finditer(html):
        # text between previous tag and this one
        if drop_until is None and m.start() > pos:
            text = _decode_entities(html[pos : m.start()])
            if text:
                cur.chars.append(text)
                if link_depth > 0:
                    cur.link_chars += len(_WS_RE.sub(" ", text).strip())
        pos = m.end()
        tag = m.group(1)
        if tag is None:  # comment / doctype / cdata
            continue
        tag = tag.lower()
        closing = m.group(0).startswith("</")
        self_closing = m.group(0).rstrip(">").endswith("/") or tag in VOID_TAGS

        if drop_until is not None:
            if closing and tag == drop_until:
                drop_until = None
            continue
        if tag in DROP_CONTENT_TAGS and not closing and not self_closing:
            drop_until = tag
            continue

        if tag == "a":
            if closing:
                link_depth = max(0, link_depth - 1)
            elif not self_closing:
                link_depth += 1
        if tag in BLOCK_TAGS:
            flush()
            if tag in BOILERPLATE_ANCESTORS:
                if closing:
                    boiler_depth = max(0, boiler_depth - 1)
                elif not self_closing:
                    boiler_depth += 1
                cur.boiler_depth = boiler_depth

    if drop_until is None and pos < n:
        text = _decode_entities(html[pos:])
        if text:
            cur.chars.append(text)
            if link_depth > 0:
                cur.link_chars += len(_WS_RE.sub(" ", text).strip())
    flush()

    kept: List[str] = []
    spans: List[Tuple[int, int]] = []
    offset = 0
    for b in blocks:
        t = b.text()
        if not t:
            continue
        if b.boiler_depth > 0:
            continue
        words = t.count(" ") + 1
        if words < MIN_WORDS:
            continue
        density = b.link_chars / len(t) if t else 1.0
        if density > MAX_LINK_DENSITY:
            continue
        if kept:
            offset += 1  # the joining '\n'
        spans.append((offset, offset + len(t)))
        offset += len(t)
        kept.append(t)
    return "\n".join(kept), spans
