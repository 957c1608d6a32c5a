"""HTML boilerplate stripping — single-pass event/stack implementation.

The engine-side analog of the reference's "printed" fast path
(``/root/reference/ocr_router.py:76-86``): instead of Tesseract over a
binarized image, a text-density + link-density DOM heuristic
(Readability/trafilatura-style) over markup.  Semantics are pinned by
``ollama_ocr_ray.spec``; the oracle implements the same contract with an
explicit DOM tree walk — this implementation never builds a tree, it
streams parser events over a stack of open tags + open block frames.
"""

from __future__ import annotations

from html.parser import HTMLParser

from ..spec import (
    BLOCK_TAGS,
    HEADING_TAGS,
    MAX_LINK_DENSITY,
    MIN_BLOCK_CHARS,
    PRUNE_TAGS,
    VOID_TAGS,
    collapse_ws,
)


class _Frame:
    __slots__ = ("tag", "parts", "links", "has_block_child")

    def __init__(self, tag: str):
        self.tag = tag
        self.parts: list[str] = []
        self.links: list[str] = []
        self.has_block_child = False


class _BlockStream(HTMLParser):
    """Emits kept leaf blocks in document order from start/data/end
    events.  ``stack`` mirrors the oracle's open-element path (pop to
    matching tag on close, ignore unmatched closes) so malformed nesting
    behaves identically in both implementations."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []      # open non-void tags
        self.prune_depth = 0            # open tags that are in PRUNE_TAGS
        self.a_depth = 0                # open <a> tags (outside prune)
        self.frames: list[_Frame] = []  # open block elements (outside prune)
        self.out: list[str] = []        # kept block texts, document order

    # -- events -------------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            return
        self.stack.append(tag)
        if tag in PRUNE_TAGS:
            self.prune_depth += 1
            return
        if self.prune_depth:
            return
        if tag == "a":
            self.a_depth += 1
        if tag in BLOCK_TAGS:
            if self.frames:
                self.frames[-1].has_block_child = True
            self.frames.append(_Frame(tag))

    def handle_startendtag(self, tag, attrs):
        pass  # empty element: no text, no frame (matches oracle leaf node)

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == tag:
                for j in range(len(self.stack) - 1, i - 1, -1):
                    self._pop_tag(self.stack[j])
                del self.stack[i:]
                return
        # unmatched close tag: ignored (same policy as oracle tree builder)

    def handle_data(self, data):
        if self.prune_depth or not data or not self.frames:
            return
        top = self.frames[-1]
        top.parts.append(data)
        if self.a_depth:
            top.links.append(data)

    def close(self):
        super().close()
        while self.stack:
            self._pop_tag(self.stack.pop())

    # -- stack/frame maintenance ---------------------------------------------
    def _pop_tag(self, tag: str) -> None:
        if tag in PRUNE_TAGS:
            self.prune_depth -= 1
            return
        if self.prune_depth:
            return
        if tag == "a" and self.a_depth:
            self.a_depth -= 1
        if tag in BLOCK_TAGS and self.frames:
            self._close_frame(self.frames.pop())

    def _close_frame(self, frame: _Frame) -> None:
        if frame.has_block_child:
            return
        text = collapse_ws(" ".join(frame.parts))
        if not text:
            return
        link_text = collapse_ws(" ".join(frame.links))
        if len(link_text) / len(text) > MAX_LINK_DENSITY:
            return
        if len(text) >= MIN_BLOCK_CHARS or frame.tag in HEADING_TAGS:
            self.out.append(text)


def extract_html_stage(markup: str) -> list[str]:
    """markup → kept main-content block texts, document order."""
    p = _BlockStream()
    p.feed(markup)
    p.close()
    return p.out
