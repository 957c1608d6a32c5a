"""Sequence packing — fixed-capacity training-example construction.

LLM pretraining concatenates documents into fixed-length sequences
("packing"): each training example is a bin of whole documents whose
token counts sum to at most the context length.  This operator assigns
every document a ``pack_id`` using next-fit-decreasing WITHIN each
input block (pack ids are made globally unique with zero exchange by
offsetting with the block's MIN doc_id — collision-free because blocks
partition the rows, so their doc_id sets are disjoint):

1. count tokens per doc (the repo's BPE-ish RE2 pattern, one Arrow
   kernel);
2. sort the block's docs by token count descending;
3. fill bins sequentially — a cumsum + ``searchsorted`` per BIN (a
   Python loop over bins, never over documents; bins ≈ tokens/C).

Block-local packing is the scale-correct choice: packing quality is a
LOCAL property (waste per bin), so there is nothing to gain from a
global exchange.  Oversized documents (more tokens than the capacity)
become solo packs flagged ``overflow`` (the downstream tokenizer
truncates or splits; this operator never drops a document).

Packing is a stateful greedy assignment, not SQL-expressible, so the
driver gate is the ``approx_users`` boolean pattern: ``pack_stats``
verifies invariants that hold for every correct next-fit packing —
every document packed exactly once (checked GLOBALLY, one exchange on
the gate only), no non-overflow pack exceeding capacity, and total
packs within next-fit's worst-case guarantee of ``2 x ceil(tokens/C)``
(+ per-block tails) — and emits booleans the SQL oracle asserts TRUE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import BPE_PATTERN


def pack_block(batch: pa.Table, *, capacity: int) -> pa.Table:
    """(doc_id, text) block → (doc_id, n_tokens, pack_id, overflow).

    Next-fit-decreasing: descending sort then sequential bins via
    cumsum + searchsorted — one iteration per emitted bin."""
    batch = batch.combine_chunks()
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("pack_id", pa.int64()), ("overflow", pa.bool_())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    toks = pc.count_substring_regex(
        batch.column("text"), BPE_PATTERN
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(-toks, kind="stable")
    ids_s, toks_s = ids[order], toks[order]
    # oversized docs lead after the descending sort: solo packs
    n_over = int(np.searchsorted(-toks_s, -np.int64(capacity),
                                 side="left"))
    pack_of = np.empty(len(ids_s), dtype=np.int64)
    pack_of[:n_over] = np.arange(n_over)
    next_pack = n_over
    csum = np.cumsum(toks_s)
    lo = n_over
    base = csum[lo - 1] if lo else 0
    while lo < len(ids_s):
        # largest prefix of the remaining docs fitting in one bin;
        # >= 1 doc always fits here (overflow docs already handled)
        hi = int(np.searchsorted(csum, base + capacity, side="right"))
        hi = max(hi, lo + 1)
        pack_of[lo:hi] = next_pack
        next_pack += 1
        base = csum[hi - 1]
        lo = hi
    # globally unique pack ids without any exchange: blocks partition
    # the table's rows, so doc_id SETS are disjoint and each block's
    # MIN doc_id is distinct — a collision-free block key (a truncated
    # hash would birthday-collide around 1M blocks)
    block_key = int(ids.min())
    if block_key >= 1 << 43 or next_pack >= 1 << 20:
        raise ValueError(
            "pack_id layout needs doc_id < 2^43 and < 2^20 packs per "
            "block; repartition or remap ids"
        )
    pack_of += np.int64(block_key) << np.int64(20)
    overflow = toks_s > capacity
    return pa.table(
        {
            "doc_id": pa.array(ids_s, type=pa.int64()),
            "n_tokens": pa.array(toks_s, type=pa.int64()),
            "pack_id": pa.array(pack_of, type=pa.int64()),
            "overflow": pa.array(overflow, type=pa.bool_()),
        }
    ).cast(out_schema)


def pack_sequences(docs, *, capacity: int = 2048):
    """documents Dataset → per-doc pack assignment (see module doc)."""
    return docs.map_batches(
        lambda b: pack_block(b, capacity=capacity),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def pack_invariants(docs, *, capacity: int = 2048) -> pa.Table:
    """Driver-checkable packing gate: booleans over invariants that
    hold for EVERY correct next-fit packing.

    - ``all_docs_packed_once``: exact GLOBAL distinct count of packed
      doc_ids equals the row count — cross-block duplicates (corrupt
      input, which would also collide the min-doc_id pack-key space)
      fail the gate.  This is the gate's one exchange; the packing
      operator itself stays exchange-free, and a verification pass is
      allowed to pay for exactness.
    - ``capacity_respected``: per-pack loads via a block-local fold
      (pack ids never span blocks by construction).
    - ``pack_count_within_2x``: next-fit's worst-case guarantee —
      adjacent bins sum above capacity, so per block
      ``packs <= 2*tokens/C + 2``; summed: ``2*lower + 2*blocks + 2``.
      (A 1.3x bound is NOT an invariant: a corpus of ~0.55*C-token
      docs packs one per bin, validly and optimally, at ~2x the token
      lower bound.)"""
    # materialize once: the gate consumes the packed rows twice (stats
    # fold + global distinct) and re-executing the read + regex token
    # count for the second pass would double the query's cost; the
    # materialized rows are 4 scalar columns and spill if large
    packed = pack_sequences(docs, capacity=capacity).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table(
                {"docs": pa.array([], type=pa.int64()),
                 "tokens": pa.array([], type=pa.int64()),
                 "packs": pa.array([], type=pa.int64()),
                 "max_load": pa.array([], type=pa.int64())}
            )
        pid = batch.column("pack_id").to_numpy(zero_copy_only=False)
        tok = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        over = batch.column("overflow").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(pid, return_inverse=True)
        load = np.bincount(inv, weights=tok).astype(np.int64)
        has_over = np.zeros(len(uniq), dtype=bool)
        np.maximum.at(has_over, inv, over)
        normal = load[~has_over]
        return pa.table(
            {
                "docs": pa.array([len(ids)], type=pa.int64()),
                "tokens": pa.array([int(tok.sum())], type=pa.int64()),
                "packs": pa.array([len(uniq)], type=pa.int64()),
                "max_load": pa.array(
                    [int(normal.max()) if len(normal) else 0],
                    type=pa.int64(),
                ),
            }
        )

    parts = packed.map_batches(block_stats, batch_size=None,
                               batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    docs_n = sum(r["docs"] for r in parts)
    tokens = sum(r["tokens"] for r in parts)
    packs = sum(r["packs"] for r in parts)
    max_load = max((r["max_load"] for r in parts), default=0)
    n_blocks = len(parts)
    # global exactly-once: distinct doc_ids == packed rows (the gate's
    # one exchange; in-block-only dup detection missed cross-block
    # duplicates, which would also collide pack-key spaces)
    n_distinct = packed.select_columns(["doc_id"]).groupby(
        "doc_id"
    ).count().count()
    lower = -(-tokens // capacity) if capacity else 0
    bound = 2 * lower + 2 * n_blocks + 2
    return pa.table(
        {
            "n_docs": pa.array([docs_n], type=pa.int64()),
            "all_docs_packed_once": pa.array([n_distinct == docs_n],
                                             type=pa.bool_()),
            "capacity_respected": pa.array([max_load <= capacity],
                                           type=pa.bool_()),
            "pack_count_within_2x": pa.array([packs <= bound],
                                             type=pa.bool_()),
        }
    )
