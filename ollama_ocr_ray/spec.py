"""The extraction contract — the single normative spec both the Ray
pipeline (``ollama_ocr_ray.stages``) and the sequential oracle
(``ollama_ocr_ray.oracle``) implement **independently**.

This module holds only *constants and pure contract functions* that
define the spec (thresholds, tag sets, the mock-transcription function,
error-text template).  The extraction *logic* (DOM walk, block scoring,
layout sort, reassembly) is written twice — once vectorized in stages/,
once sequentially in oracle.py — so the span-equality tests are a real
check, mirroring how the reference's implicit golden-output workflow
(README.md:168-189) compared independent engines.

Per-kind semantics
------------------

``text`` span  ->  one output span, ``kind='text'``,
    ``text = input.strip()`` (the reference's only normalization,
    ``ocr_router.py:46,86,195,301``).  Dropped if empty after strip.

``html`` span  ->  one output span per *kept block*, ``kind='text'``.
    1. Parse the markup into a DOM; HTML entities unescaped.
    2. Remove PRUNE_TAGS subtrees entirely.
    3. Candidate blocks = BLOCK_TAGS elements that contain no BLOCK_TAGS
       descendant (leaf blocks), in document order.
    4. block text = whitespace-collapse(join of descendant text nodes,
       joined by a single space); link text = same over text nodes with
       an <a> ancestor inside the block.
    5. keep iff link_density = len(link_text)/len(text) <= MAX_LINK_DENSITY
       and (len(text) >= MIN_BLOCK_CHARS, or tag in HEADING_TAGS and
       len(text) > 0).
    This is the Readability/trafilatura-style text-density + link-density
    heuristic standing in for the reference's printed-path OCR
    (``ocr_router.py:76-86``).

``pdf`` span  ->  one output span per page, ``kind='text'``.
    Payload is layout text: newline-separated records
    ``page|y|x|block-text`` in arbitrary order.  Blocks are grouped by
    page, ordered by (y, x) within a page, each block
    whitespace-collapsed, empty blocks dropped, page text = blocks
    joined by '\\n'; pages emitted in ascending page order, empty pages
    dropped.  This mirrors PDF → ordered pages → per-page text → page
    order reassembly (``ocr_router.py:250-310``).

``media`` span  ->  one output span.
    If ``media_ref`` ends with CORRUPT_SUFFIX: ``kind='error'``,
    ``text = ERROR_TEXT`` (inline error-span semantics of
    ``ocr_router.py:296-298``), media_ref preserved.
    Else: ``kind='ocr'``, ``text = mock_transcript(media_ref)``,
    media_ref preserved.

Ordering: a document's input spans are processed in ascending ``offset``;
each input span yields its output spans in the order defined above; the
concatenated sequence is numbered with a dense 0-based ``order``.
Equality contract: per doc_id, exact (kind, text, media_ref, order)
sequence equality.
"""

from __future__ import annotations

import hashlib

# --- HTML heuristics -------------------------------------------------------
PRUNE_TAGS = frozenset(
    {"script", "style", "nav", "header", "footer", "aside", "form", "noscript"}
)
BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote", "td"}
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
# void elements never get a closing tag; treat as self-closing in both parsers
VOID_TAGS = frozenset(
    {"br", "img", "hr", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33

# --- media / OCR mock ------------------------------------------------------
CORRUPT_SUFFIX = "#corrupt"
ERROR_TEXT = "[Error processing page: corrupt media payload]"


def unsupported_text(kind: str) -> str:
    """Inline error span for a span kind the engine doesn't know —
    the per-record error-row-and-continue semantics of the reference's
    batch loop (``ocr_router.py:412-415``): one bad record never stops
    the run."""
    return f"[Error processing page: unsupported span kind: {kind}]"

# deterministic mock-vision-model vocabulary (stands in for TrOCR weights,
# ``ocr_router.py:31-46``); the transcript is a pure function of media_ref
# so the pipeline and the oracle agree without sharing model state.
_VOCAB = (
    "invoice total receipt amount date item quantity price store tax "
    "subtotal cash change card number street city note draft meeting "
    "agenda action signed page figure table caption margin line sketch"
).split()


def mock_transcript(media_ref: str) -> str:
    """Deterministic transcription contract for a media span.

    12 vocabulary words keyed by the sha256 digest of the ref.  This is
    the *contract* (like the reference's fixed seed/temperature
    determinism knobs, ``ollama_local_ocr.py:143-144``); the OCR actor
    additionally burns deterministic CPU to model inference cost.
    """
    digest = hashlib.sha256(media_ref.encode("utf-8")).digest()
    return " ".join(_VOCAB[b % len(_VOCAB)] for b in digest[:12])


def collapse_ws(s: str) -> str:
    """Whitespace-collapse: split on any whitespace run, join with ' '."""
    return " ".join(s.split())
