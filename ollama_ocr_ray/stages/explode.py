"""Span explode: documents rows → one row per span.

This is the engine's salted-split skew mitigation (SURVEY.md §4.3): a
media-heavy document (the reference's 100-page-PDF-in-line problem,
``ocr_router.py:279-298``) is decomposed to span granularity *before*
the expensive stages, so its spans spread across many blocks/actors; the
(offset, sub) keys assigned here let ``reassemble_group`` restore the
exact sequence after the ``groupby(doc_id)`` exchange.

A sentinel row (kind='__doc__', offset=-1) is emitted per document so
documents whose spans all extract to nothing still appear (with an empty
span list) in the output — the reference writes an output file per
document even when extraction is empty (``ocr_router.py:399-403``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DOC_SENTINEL = "__doc__"

EXPLODED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)


def explode_batch(batch: pa.Table, offset_range=None) -> pa.Table:
    """``offset_range=(lo, hi)`` keeps only spans with lo <= offset < hi —
    the span-level analog of the reference's --page N selection
    (``ollama_cloud_ocr.py:689-690,722-731``), applied as a vectorized
    predicate before any extraction work (predicate pushdown, O3)."""
    batch = batch.combine_chunks()
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()  # StructArray of all spans, parent-ordered
    lengths = np.asarray(spans.value_lengths())
    n_docs = len(batch)
    parent = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    doc_ids = batch.column("doc_id")
    span_docs = doc_ids.take(pa.array(parent))
    exploded = pa.table(
        {
            "doc_id": span_docs,
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    ).cast(EXPLODED_SCHEMA)
    if offset_range is not None:
        lo, hi = offset_range
        off = exploded.column("offset")
        import pyarrow.compute as pc

        exploded = exploded.filter(
            pc.and_(pc.greater_equal(off, pa.scalar(lo, type=pa.int32())),
                    pc.less(off, pa.scalar(hi, type=pa.int32())))
        )
    sentinels = pa.table(
        {
            "doc_id": doc_ids,
            "offset": pa.array(np.full(n_docs, -1, dtype=np.int32)),
            "kind": pa.array([DOC_SENTINEL] * n_docs),
            "text": pa.array([""] * n_docs),
            "media_ref": pa.array([""] * n_docs),
        }
    ).cast(EXPLODED_SCHEMA)
    return pa.concat_tables([sentinels, exploded])
