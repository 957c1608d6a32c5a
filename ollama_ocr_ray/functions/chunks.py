"""Document chunking: split each document into fixed-size overlapping
character windows — the context-window prep step (RAG indexing,
fixed-block pretraining) between curation and packing.

Scale design: exchange-FREE.  Chunking is per-document, so one
streaming ``map_batches`` pass emits every chunk; no sort, no groupby.
The only care is vectorization: Arrow's ``utf8_slice_codepoints``
takes scalar offsets, so the pass slices per CHUNK LEVEL (all docs'
chunk j in one kernel call — max-chunks-per-doc calls total) rather
than per row.  Chunk text length is derived
arithmetically (min(size, len - start)), not re-measured.

Chunk positions are codepoint-based on BOTH sides (Arrow
``utf8_slice_codeunits`` slices UTF-8 by codepoint / DuckDB ``substr``
counts characters), so the oracle compares exactly for any unicode
input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_idx", pa.int64()),
        ("chunk_text", pa.string()),
        ("n_chunk_chars", pa.int64()),
    ]
)


def chunk_documents(docs, *, size: int = 200, overlap: int = 50):
    """One row per (doc, chunk): windows of ``size`` codepoints every
    ``size - overlap`` positions (start < doc length; empty docs emit
    no chunks).  The final chunk may be shorter than ``size``."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap

    def chunk_batch(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return CHUNK_SCHEMA.empty_table()
        batch = batch.combine_chunks()
        text = batch.column("text")
        lengths = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        n_chunks = np.where(lengths > 0, (lengths - 1) // stride + 1, 0)
        if n_chunks.max(initial=0) == 0:
            return CHUNK_SCHEMA.empty_table()
        parts = []
        ids = batch.column("doc_id")
        for j in range(int(n_chunks.max())):
            sel = n_chunks > j
            idx = pa.array(np.flatnonzero(sel), type=pa.int64())
            start = j * stride
            sub = pc.utf8_slice_codeunits(
                text.take(idx), start=start, stop=start + size
            )
            ln = np.minimum(size, lengths[sel] - start)
            parts.append(
                pa.table(
                    {
                        "doc_id": ids.take(idx),
                        "chunk_idx": pa.array(
                            np.full(int(sel.sum()), j, dtype=np.int64)
                        ),
                        "chunk_text": sub,
                        "n_chunk_chars": pa.array(ln.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts).cast(CHUNK_SCHEMA)

    return docs.map_batches(chunk_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
