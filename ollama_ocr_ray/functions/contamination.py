"""Benchmark decontamination: flag corpus documents that share word
n-grams with a (small) evaluation set — the contamination check every
training-data pipeline runs before a model ever sees the corpus.

Shape of the computation at 100 TB: the eval side is a fixed benchmark
suite (MB-scale, e.g. a few thousand eval questions), so its distinct
gram set is driver-collectable and broadcast; the corpus side is one
streaming ``map_batches`` pass that never shuffles.  Ray Data
serializes the scan UDF (with the captured gram set) into the object
store ONCE and every task reads that copy — the broadcast-small-side
pattern, same as the join lookups in ``relational.py``.

Gram semantics (shared with the SQL oracle and the MinHash shingles in
``dedup.py``): raw whitespace tokens, word-k-grams joined by a single
space, documents shorter than k degrade to one whole-document gram.
Per-document gram construction is a per-string operation (same
justification as ``dedup._shingle_list``); everything around it is
batch-level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import word_kgrams as _gram_list


def eval_gram_set(docs, *, eval_mod: int, k: int) -> frozenset:
    """Distinct gram set of the eval slice (``doc_id % eval_mod == 0``
    stands in for a real benchmark table; pass a real eval Dataset with
    ``eval_mod=1`` to gram every row).  Per-block distinct first, so
    the driver collects each gram at most once per block."""

    def gram_rows(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sel = ids % eval_mod == 0
        grams: set[str] = set()
        texts = batch.column("text").to_numpy(zero_copy_only=False)
        for t in texts[sel]:
            grams.update(_gram_list(t.split(), k))
        return pa.table({"g": pa.array(sorted(grams), type=pa.string())})

    rows = docs.map_batches(gram_rows, batch_format="pyarrow").take_all()
    return frozenset(r["g"] for r in rows)


def decontaminate(docs, *, eval_mod: int = 101, k: int = 3):
    """(doc_id, n_overlap) for every non-eval document sharing at least
    one word-k-gram with the eval slice; ``n_overlap`` counts DISTINCT
    shared grams.  Two passes over ``docs`` (eval grams, then scan) —
    the read is re-executed, never materialized."""
    eval_set = eval_gram_set(docs, eval_mod=eval_mod, k=k)

    def scan(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_numpy(zero_copy_only=False)
        out_ids, out_n = [], []
        for did, t in zip(ids, texts):
            if did % eval_mod == 0:
                continue
            n = len(set(_gram_list(t.split(), k)) & eval_set)
            if n:
                out_ids.append(did)
                out_n.append(n)
        return pa.table(
            {"doc_id": pa.array(np.asarray(out_ids, dtype=np.int64)),
             "n_overlap": pa.array(np.asarray(out_n, dtype=np.int64))}
        )

    return docs.map_batches(scan, batch_format="pyarrow")
