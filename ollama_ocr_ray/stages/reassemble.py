"""Span reassembly: exploded+extracted rows → one row per document.

The engine's one required shuffle (SURVEY.md §2.7): ``groupby(doc_id)``
hash-partitions the extracted span rows, then this map_groups body
restores the exact sequence — sort by (offset, sub), drop the document
sentinel, assign a dense 0-based ``order`` — generalizing the
reference's page-order reassembly (``/root/reference/ocr_router.py:
279,294,301``) to parallel, salted-split execution: order is derived
from keys assigned *before* the split, never from arrival order.

Besides the contract columns (doc_id, spans) each output row carries the
per-document metrics the reference put in its CSV summary row
(``ocr_router.py:406-408``): engine (first-span-kind election, G5),
chars (G1), span/error counts (G2) and summed OCR latency — consumed by
the summary aggregate and the partition lineage manifest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import OUT_SPAN_STRUCT
from .explode import DOC_SENTINEL

REASSEMBLED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(OUT_SPAN_STRUCT)),
        pa.field("engine", pa.string()),
        pa.field("chars", pa.int64()),
        pa.field("n_spans", pa.int32()),
        pa.field("n_errors", pa.int32()),
        pa.field("ocr_ms", pa.float64()),
    ]
)


def reassemble_sorted_block(batch: pa.Table) -> pa.Table:
    """Vectorized many-documents-per-call reassembly.

    Input: a block of extracted span rows from ``Dataset.sort('doc_id')``
    — every document's rows are contained in one block (the invariant
    Ray's own ``GroupedData.map_groups`` relies on: sort range-partitions
    on the key, rows equal to a boundary land on one side).  The sort key
    is doc_id ONLY: a distributed sort on (doc_id, offset, sub) could
    place a range boundary *inside* a document, so the (offset, sub)
    ordering is restored here with one block-local vectorized sort.

    Replaces the per-document ``map_groups`` body (one Python call + one
    1-row Arrow table per doc_id — the round-1 bench's dominant cost):
    one call now reassembles every document in the block via segment
    boundaries (``np.diff`` on doc codes, cumsum segment sums,
    ``ListArray.from_arrays``).
    """
    batch = batch.combine_chunks()
    n = len(batch)
    if n == 0:
        return REASSEMBLED_SCHEMA.empty_table()
    idx = pc.sort_indices(
        batch,
        sort_keys=[("doc_id", "ascending"), ("offset", "ascending"),
                   ("sub", "ascending")],
    )
    batch = batch.take(idx).combine_chunks()
    doc_col = batch.column("doc_id").combine_chunks()
    # group boundaries: positions where doc_id changes (rows are sorted)
    neq = np.asarray(
        pc.not_equal(doc_col.slice(1, n - 1), doc_col.slice(0, n - 1))
    )
    starts = np.concatenate([[0], np.nonzero(neq)[0] + 1]).astype(np.int64)
    ends = np.concatenate([starts[1:], [n]])
    # body = non-sentinel rows; per-group body extents via mask cumsum
    kinds_all = batch.column("kind").combine_chunks()
    body_mask = pc.not_equal(kinds_all, DOC_SENTINEL)
    csum = np.concatenate([[0], np.cumsum(np.asarray(body_mask))])
    body_starts = csum[starts]
    body_ends = csum[ends]
    lengths = body_ends - body_starts
    body = batch.filter(body_mask).combine_chunks()
    total = len(body)
    kinds = body.column("kind").combine_chunks()
    texts = body.column("text").combine_chunks()
    # per-span dense order: global arange minus each group's start
    order = np.arange(total, dtype=np.int32) - np.repeat(
        body_starts, lengths
    ).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [
            kinds.combine_chunks() if isinstance(kinds, pa.ChunkedArray) else kinds,
            texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts,
            body.column("media_ref").combine_chunks(),
            pa.array(order),
        ],
        fields=list(OUT_SPAN_STRUCT),
    )
    offsets = pa.array(np.concatenate([body_starts, [total]]), type=pa.int32())
    spans = pa.ListArray.from_arrays(offsets, struct)
    # segment sums via cumsum difference (empty groups yield 0)
    ulen = np.concatenate(
        [[0], np.cumsum(np.asarray(pc.utf8_length(texts)), dtype=np.int64)]
    )
    chars = ulen[body_ends] - ulen[body_starts]
    errc = np.concatenate(
        [[0], np.cumsum(np.asarray(pc.equal(kinds, "error")).astype(np.int64))]
    )
    n_errors = (errc[body_ends] - errc[body_starts]).astype(np.int32)
    if "ocr_ms" in body.column_names:
        mcs = np.concatenate(
            [[0.0], np.cumsum(np.asarray(body.column("ocr_ms")))]
        )
        ocr_ms = mcs[body_ends] - mcs[body_starts]
    else:
        ocr_ms = np.zeros(len(starts))
    # engine election: kind of each group's first body span ("" if empty)
    nonempty = lengths > 0
    if total:
        first = kinds.take(pa.array(np.where(nonempty, body_starts, 0)))
        engine = pc.if_else(pa.array(nonempty), first, pa.scalar(""))
    else:
        engine = pa.array([""] * len(starts))
    return pa.table(
        {
            "doc_id": doc_col.take(pa.array(starts)),
            "spans": spans,
            "engine": engine,
            "chars": pa.array(chars, type=pa.int64()),
            "n_spans": pa.array(lengths.astype(np.int32)),
            "n_errors": pa.array(n_errors),
            "ocr_ms": pa.array(ocr_ms, type=pa.float64()),
        }
    ).cast(REASSEMBLED_SCHEMA)


def reassemble_group(group: pa.Table) -> pa.Table:
    group = group.combine_chunks()
    doc_id = group.column("doc_id")[0].as_py()
    body = group.filter(pc.not_equal(group.column("kind"), DOC_SENTINEL))
    idx = pc.sort_indices(
        body, sort_keys=[("offset", "ascending"), ("sub", "ascending")]
    )
    body = body.take(idx)
    n = len(body)
    kinds = body.column("kind").combine_chunks()
    texts = body.column("text").combine_chunks()
    struct = pa.StructArray.from_arrays(
        [
            kinds,
            texts,
            body.column("media_ref").combine_chunks(),
            pa.array(np.arange(n, dtype=np.int32)),
        ],
        fields=list(OUT_SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array([0, n], type=pa.int32()), struct)
    engine = kinds[0].as_py() if n else ""
    chars = int(pc.sum(pc.utf8_length(texts)).as_py() or 0)
    n_errors = int(pc.sum(pc.equal(kinds, "error")).as_py() or 0)
    if "ocr_ms" in group.column_names:
        ocr_ms = float(pc.sum(body.column("ocr_ms")).as_py() or 0.0)
    else:
        ocr_ms = 0.0
    return pa.table(
        {
            "doc_id": pa.array([doc_id]),
            "spans": spans,
            "engine": pa.array([engine]),
            "chars": pa.array([chars], type=pa.int64()),
            "n_spans": pa.array([n], type=pa.int32()),
            "n_errors": pa.array([n_errors], type=pa.int32()),
            "ocr_ms": pa.array([ocr_ms], type=pa.float64()),
        }
    ).cast(REASSEMBLED_SCHEMA)
