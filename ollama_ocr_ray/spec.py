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


# --- extraction policies (mode dispatch, R4-R9) ------------------------------
# The reference's --mode surface: text / handwriting / structured /
# document / multi (``ollama_cloud_ocr.py:692-695,744-788``).  Each mode
# maps a media span to an ordered list of output texts; ``multi`` is the
# 3-step fan-out of ``multi_step_analysis`` (``ollama_cloud_ocr.py:
# 541-599``).  Deterministic contract: pure function of (mode, media_ref),
# domain-separated digests.  User extension point: ``register_policy``
# (the typed analog of adding a prompt to the prompts dict,
# ``ollama_cloud_ocr.py:401-414``).

POLICY_MODES = ("text", "handwriting", "structured", "document", "multi")


def _mode_words(media_ref: str, domain: str, n: int) -> list[str]:
    digest = hashlib.sha256(f"{domain}:{media_ref}".encode("utf-8")).digest()
    return [_VOCAB[b % len(_VOCAB)] for b in digest[:n]]


def _handwriting_transcript(media_ref: str) -> list[str]:
    return [" ".join(_mode_words(media_ref, "handwriting", 10))]


def _structured_payload(media_ref: str) -> list[str]:
    """JSON record mirroring the receipt schema of
    ``ollama_cloud_ocr.py:401-414``; emitted as text (the reference never
    parses it back)."""
    import json

    d = hashlib.sha256(f"structured:{media_ref}".encode("utf-8")).digest()
    items = [
        {
            "name": _VOCAB[d[4 + 2 * i] % len(_VOCAB)],
            "price": round((d[5 + 2 * i] + 1) / 4.0, 2),
            "quantity": 1 + d[10 + i] % 3,
        }
        for i in range(1 + d[3] % 3)
    ]
    obj = {
        "store_name": " ".join(_mode_words(media_ref, "store", 2)),
        "total_amount": round(sum(i["price"] * i["quantity"] for i in items), 2),
        "date": f"20{20 + d[0] % 6}-{1 + d[1] % 12:02d}-{1 + d[2] % 28:02d}",
        "items": items,
    }
    return [json.dumps(obj, separators=(", ", ": "))]


def _document_analysis(media_ref: str) -> list[str]:
    ws = _mode_words(media_ref, "analysis", 24)
    return [
        "Document Analysis: "
        + " ".join(ws[:8]) + ". " + " ".join(ws[8:16]) + ". "
        + " ".join(ws[16:24]) + "."
    ]


def _multi_step(media_ref: str) -> list[str]:
    """Three ordered spans per media span — description, text
    extraction, objects — the per-step result dict of
    ``ollama_cloud_ocr.py:541-599`` as ordered sub-spans."""
    return [
        "[description] " + " ".join(_mode_words(media_ref, "describe", 8)),
        "[text] " + mock_transcript(media_ref),
        "[objects] " + ", ".join(_mode_words(media_ref, "objects", 5)),
    ]


_POLICIES = {
    "text": lambda ref: [mock_transcript(ref)],
    "handwriting": _handwriting_transcript,
    "structured": _structured_payload,
    "document": _document_analysis,
    "multi": _multi_step,
}


def register_policy(mode: str, fn) -> None:
    """Register a named extraction policy (mode → callable(media_ref) ->
    ordered list of output texts) in THIS process.  Driver-side
    registration does NOT reach Ray worker processes — for custom
    policies in a pipeline, pass the callable itself as ``policy=``
    (it is serialized to the actors); names are for built-ins and for
    policies registered in a module that workers import."""
    _POLICIES[mode] = fn


def resolve_policy(mode):
    """Policy name/callable → callable(media_ref) -> list[str].

    An unknown NAME is a job-configuration error, not a per-record data
    error, so it raises here (at actor construction — fail fast, the
    analog of argparse ``choices`` in the reference CLIs) instead of
    silently tagging every media span with error text under
    ``kind='ocr'``."""
    if callable(mode):
        return mode
    fn = _POLICIES.get(mode)
    if fn is None:
        raise ValueError(
            f"unknown extraction mode: {mode!r} (known: {sorted(_POLICIES)}; "
            "or pass a callable)"
        )
    return fn


def mode_transcript(media_ref: str, mode="text") -> list[str]:
    """Ordered output texts for one (non-corrupt) media span under a
    policy.  ``mode`` is a built-in/registered name or a callable
    (the distributed-safe extension path)."""
    return resolve_policy(mode)(media_ref)
