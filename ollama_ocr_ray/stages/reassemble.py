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
