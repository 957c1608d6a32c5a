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


def _bloom_indices(gram: bytes, bits: int, n_hashes: int) -> list:
    """Deterministic bit positions for one gram: crc32 under distinct
    integer salts (PYTHONHASHSEED-independent, stable across
    processes/nodes — the property Python's ``hash`` lacks)."""
    import zlib

    return [zlib.crc32(gram, s) % bits for s in range(1, n_hashes + 1)]


def build_eval_bloom(eval_set, *, bits: int, n_hashes: int) -> np.ndarray:
    """Bit-packed Bloom filter (uint8[bits/8]) over the eval gram set.

    At 100 TB the eval suite itself can be large (every benchmark ever
    published): the exact gram SET costs ~50 bytes/gram in worker heap,
    the Bloom costs ~1.2 bytes/gram at 1% FPR — the broadcast that
    still fits when the set no longer does."""
    idx = np.array(
        [i for g in eval_set for i in _bloom_indices(g.encode(), bits,
                                                     n_hashes)],
        dtype=np.int64,
    )
    bloom = np.zeros((bits + 7) // 8, dtype=np.uint8)  # ceil: bit
    # positions reach bits-1, whose byte is (bits-1)//8
    if len(idx):
        np.bitwise_or.at(bloom, idx // 8,
                         np.left_shift(1, idx % 8).astype(np.uint8))
    return bloom


def decontaminate_bloom(docs, *, eval_mod: int = 101, k: int = 3,
                        bits: int = 1 << 20, n_hashes: int = 4):
    """Bloom-pruned benchmark decontamination — same output contract
    as :func:`decontaminate` (``(doc_id, n_overlap)`` over non-eval
    docs, distinct shared grams), with the scan gated by a Bloom
    filter so the exact-verify work touches only Bloom-positive grams.

    A Bloom filter has NO false negatives, so the prune is lossless:
    every truly-shared gram is Bloom-positive and reaches the exact
    check; Bloom-only false positives are discarded there, never
    counted.  The common case (a clean document, every gram negative)
    short-circuits after the bit probes.

    In-sandbox the exact check intersects the broadcast eval set (it
    is small here); at real scale the second stage becomes a
    candidate-grams ⋈ eval-grams ``hash_join`` keyed on the gram —
    candidates are FPR-sized, so that exchange is tiny either way.
    """
    import zlib

    eval_set = eval_gram_set(docs, eval_mod=eval_mod, k=k)
    bloom = build_eval_bloom(eval_set, bits=bits, n_hashes=n_hashes)
    salts = tuple(range(1, n_hashes + 1))

    def scan(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_numpy(zero_copy_only=False)
        out_ids, out_n = [], []
        for did, t in zip(ids, texts):
            if did % eval_mod == 0:
                continue
            cand = set()
            for g in set(_gram_list(t.split(), k)):
                b = g.encode()
                if all(
                    bloom[(h := zlib.crc32(b, s) % bits) // 8]
                    & (1 << (h % 8))
                    for s in salts
                ):
                    cand.add(g)
            n = len(cand & eval_set) if cand else 0
            if n:
                out_ids.append(did)
                out_n.append(n)
        return pa.table(
            {"doc_id": pa.array(np.asarray(out_ids, dtype=np.int64)),
             "n_overlap": pa.array(np.asarray(out_n, dtype=np.int64))}
        )

    return docs.map_batches(scan, batch_format="pyarrow")
