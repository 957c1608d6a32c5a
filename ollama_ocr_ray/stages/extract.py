"""Per-span extraction dispatcher (stateless map_batches stage).

One pass over an exploded batch: ``text`` spans strip vectorized
(pyarrow.compute), ``html``/``pdf`` spans run the per-string parsers
(genuinely non-vectorizable DOM/layout walks), ``media`` and sentinel
rows pass through untouched for the downstream OCR actor stage.  This is
the engine's analog of the reference's router dispatch
(``/root/reference/ocr_router.py:220-247``) with the per-kind semantics
of ``ollama_ocr_ray.spec``.

Output rows: (doc_id, offset, sub, kind, text, media_ref) where ``sub``
numbers the outputs of one input span (0-based) — (offset, sub) is the
reassembly sort key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..spec import unsupported_text
from .explode import DOC_SENTINEL
from .html_extract import extract_html_stage
from .pdf_parse import parse_pdf_stage

_KNOWN_KINDS = ("html", "pdf", "text", "media", DOC_SENTINEL)

EXTRACTED_SPAN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("sub", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

_PARSERS = {"html": extract_html_stage, "pdf": parse_pdf_stage}


def _empty() -> pa.Table:
    return EXTRACTED_SPAN_SCHEMA.empty_table()


def extract_batch(batch: pa.Table) -> pa.Table:
    batch = batch.combine_chunks()
    kind = np.asarray(batch.column("kind"))
    pieces: list[pa.Table] = []

    # --- passthrough: media spans + doc sentinels (sub=0) ------------------
    passthru = np.isin(kind, ("media", DOC_SENTINEL))
    if passthru.any():
        sub_t = batch.take(pa.array(np.nonzero(passthru)[0]))
        pieces.append(
            pa.table(
                {
                    "doc_id": sub_t.column("doc_id"),
                    "offset": sub_t.column("offset"),
                    "sub": pa.array(np.zeros(len(sub_t), dtype=np.int32)),
                    "kind": sub_t.column("kind"),
                    "text": sub_t.column("text"),
                    "media_ref": sub_t.column("media_ref"),
                }
            ).cast(EXTRACTED_SPAN_SCHEMA)
        )

    # --- text spans: vectorized strip, drop empty (spec §text) -------------
    is_text = kind == "text"
    if is_text.any():
        sub_t = batch.take(pa.array(np.nonzero(is_text)[0]))
        stripped = pc.utf8_trim_whitespace(sub_t.column("text"))
        keep = pc.greater(pc.utf8_length(stripped), 0)
        sub_t = sub_t.filter(keep)
        if len(sub_t):
            pieces.append(
                pa.table(
                    {
                        "doc_id": sub_t.column("doc_id"),
                        "offset": sub_t.column("offset"),
                        "sub": pa.array(np.zeros(len(sub_t), dtype=np.int32)),
                        "kind": pa.array(["text"] * len(sub_t)),
                        "text": stripped.filter(keep),
                        "media_ref": pa.array([""] * len(sub_t)),
                    }
                ).cast(EXTRACTED_SPAN_SCHEMA)
            )

    # --- html / pdf spans: per-string parsers ------------------------------
    for name, parser in _PARSERS.items():
        m = kind == name
        if not m.any():
            continue
        idx = np.nonzero(m)[0]
        sub_t = batch.take(pa.array(idx))
        docs = sub_t.column("doc_id").to_pylist()
        offs = sub_t.column("offset").to_pylist()
        payloads = sub_t.column("text").to_pylist()
        o_doc: list[str] = []
        o_off: list[int] = []
        o_sub: list[int] = []
        o_txt: list[str] = []
        for d, off, payload in zip(docs, offs, payloads):
            for j, t in enumerate(parser(payload)):
                o_doc.append(d)
                o_off.append(off)
                o_sub.append(j)
                o_txt.append(t)
        if o_doc:
            pieces.append(
                pa.table(
                    {
                        "doc_id": pa.array(o_doc),
                        "offset": pa.array(o_off, type=pa.int32()),
                        "sub": pa.array(o_sub, type=pa.int32()),
                        "kind": pa.array(["text"] * len(o_doc)),
                        "text": pa.array(o_txt),
                        "media_ref": pa.array([""] * len(o_doc)),
                    }
                ).cast(EXTRACTED_SPAN_SCHEMA)
            )

    # --- unknown kinds → inline error span, continue (spec) -----------------
    unknown = ~np.isin(kind, _KNOWN_KINDS)
    if unknown.any():
        sub_t = batch.take(pa.array(np.nonzero(unknown)[0]))
        pieces.append(
            pa.table(
                {
                    "doc_id": sub_t.column("doc_id"),
                    "offset": sub_t.column("offset"),
                    "sub": pa.array(np.zeros(len(sub_t), dtype=np.int32)),
                    "kind": pa.array(["error"] * len(sub_t)),
                    "text": pa.array(
                        [unsupported_text(k) for k in sub_t.column("kind").to_pylist()]
                    ),
                    "media_ref": sub_t.column("media_ref"),
                }
            ).cast(EXTRACTED_SPAN_SCHEMA)
        )

    if not pieces:
        return _empty()
    return pa.concat_tables(pieces)
