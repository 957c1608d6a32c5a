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


def _assign_packs(ids: np.ndarray, toks: np.ndarray, capacity: int):
    """Next-fit-decreasing assignment kernel shared by ``pack_block``
    and ``packed_examples_block``: returns (order, pack_of, overflow)
    where ``order`` sorts the batch by token count descending,
    ``pack_of`` is the globally-unique pack id per SORTED row
    (nondecreasing), and ``overflow`` flags solo oversized packs."""
    order = np.argsort(-toks, kind="stable")
    toks_s = toks[order]
    # oversized docs lead after the descending sort: solo packs
    n_over = int(np.searchsorted(-toks_s, -np.int64(capacity),
                                 side="left"))
    pack_of = np.empty(len(toks_s), dtype=np.int64)
    pack_of[:n_over] = np.arange(n_over)
    next_pack = n_over
    csum = np.cumsum(toks_s)
    lo = n_over
    base = csum[lo - 1] if lo else 0
    while lo < len(toks_s):
        # largest prefix of the remaining docs fitting in one bin;
        # >= 1 doc always fits here (overflow docs already handled)
        hi = int(np.searchsorted(csum, base + capacity, side="right"))
        hi = max(hi, lo + 1)
        pack_of[lo:hi] = next_pack
        next_pack += 1
        base = csum[hi - 1]
        lo = hi
    # globally unique pack ids without any exchange: batches partition
    # the table's rows, so doc_id SETS are disjoint and each batch's
    # MIN doc_id is distinct — a collision-free batch key (a truncated
    # hash would birthday-collide around 1M batches).  This holds for
    # ANY row partitioning, so a size-split map block stays correct
    # (ADVICE r3).
    block_key = int(ids.min())
    if block_key >= 1 << 43 or next_pack >= 1 << 20:
        raise ValueError(
            "pack_id layout needs doc_id < 2^43 and < 2^20 packs per "
            "block; repartition or remap ids"
        )
    pack_of += np.int64(block_key) << np.int64(20)
    overflow = toks_s > capacity
    return order, pack_of, overflow


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
    order, pack_of, overflow = _assign_packs(ids, toks, capacity)
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "n_tokens": pa.array(toks[order], type=pa.int64()),
            "pack_id": pa.array(pack_of, type=pa.int64()),
            "overflow": pa.array(overflow, type=pa.bool_()),
        }
    ).cast(out_schema)


PACK_SEP = "\n\n"


def packed_examples_block(batch: pa.Table, *, capacity: int,
                          sep: str = PACK_SEP) -> pa.Table:
    """(doc_id, text) block → ONE ROW PER PACK: the actual training
    example (docs of the pack concatenated with ``sep`` in pack order)
    plus its stats — the export's last mile.  Concatenation is a
    vectorized ``binary_join`` over a ListArray built from the pack
    boundaries (pack ids are nondecreasing over the NFD order), never
    a per-doc Python loop."""
    batch = batch.combine_chunks()
    out_schema = pa.schema(
        [("pack_id", pa.int64()), ("n_docs", pa.int64()),
         ("n_tokens", pa.int64()), ("overflow", pa.bool_()),
         ("text", pa.string())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    toks = pc.count_substring_regex(
        batch.column("text"), BPE_PATTERN
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    order, pack_of, overflow = _assign_packs(ids, toks, capacity)
    text_s = batch.column("text").chunk(0).take(
        pa.array(order, type=pa.int64())
    )
    starts = np.flatnonzero(
        np.concatenate([[True], pack_of[1:] != pack_of[:-1]])
    )
    offsets = np.concatenate([starts, [len(pack_of)]]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                     text_s)
    joined = pc.binary_join(lists, sep)
    toks_s = toks[order]
    return pa.table(
        {
            "pack_id": pa.array(pack_of[starts], type=pa.int64()),
            "n_docs": pa.array(np.diff(offsets).astype(np.int64)),
            "n_tokens": pa.array(np.add.reduceat(toks_s, starts),
                                 type=pa.int64()),
            # only solo oversized packs can overflow, and they lead
            "overflow": pa.array(overflow[starts], type=pa.bool_()),
            "text": joined,
        }
    ).cast(out_schema)


def pack_sequences(docs, *, capacity: int = 2048):
    """documents Dataset → per-doc pack assignment (see module doc).
    ``batch_size=None`` is explicit: one call per block (the packing
    unit), not a harness default that could silently change
    (ADVICE r3) — correctness holds for any partitioning, but the
    2x-bound accounting and bin quality are per-unit properties."""
    return docs.map_batches(
        lambda b: pack_block(b, capacity=capacity),
        batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
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
    - ``capacity_respected``: per-pack loads via a GLOBAL groupby on
      pack_id — alignment-independent, so a size-split block cannot
      double-count a pack or undercount a load (ADVICE r3).
    - ``pack_count_within_2x``: next-fit's worst-case guarantee —
      adjacent bins sum above capacity, so per packing unit
      ``packs <= 2*tokens/C + 2``; summed: ``2*lower + 2*units + 2``
      (units counted exactly as distinct pack-key high bits).
      (A 1.3x bound is NOT an invariant: a corpus of ~0.55*C-token
      docs packs one per bin, validly and optimally, at ~2x the token
      lower bound.)"""
    from ray.data.aggregate import Sum

    # materialize once: the gate consumes the packed rows three times
    # (totals fold + per-pack groupby + global distinct) and
    # re-executing the read + regex token count each pass would
    # multiply the query's cost; the materialized rows are 4 scalar
    # columns and spill if large
    packed = pack_sequences(docs, capacity=capacity).materialize()

    def totals_block(batch: pa.Table) -> pa.Table:
        # split-safe: plain sums don't care about block/unit alignment
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table(
                {"docs": pa.array([], type=pa.int64()),
                 "tokens": pa.array([], type=pa.int64())}
            )
        tok = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "docs": pa.array([batch.num_rows], type=pa.int64()),
                "tokens": pa.array([int(tok.sum())], type=pa.int64()),
            }
        )

    parts = packed.map_batches(totals_block, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    docs_n = sum(r["docs"] for r in parts)
    tokens = sum(r["tokens"] for r in parts)

    # per-pack loads via a GLOBAL groupby on pack_id (ADVICE r3: a
    # size-split materialized block no longer double-counts a pack or
    # undercounts its load — the aggregate is alignment-independent)
    def proj(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.schema(
                [("pack_id", pa.int64()), ("n_tokens", pa.int64()),
                 ("over", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "pack_id": batch.column("pack_id"),
                "n_tokens": batch.column("n_tokens"),
                "over": batch.column("overflow").cast(pa.int64()),
            }
        )

    per_pack = (
        packed.map_batches(proj, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("pack_id")
        .aggregate(Sum("n_tokens", alias_name="load"),
                   Sum("over", alias_name="n_over"))
        .materialize()
    )

    def pack_fold(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table(
                {"packs": pa.array([], type=pa.int64()),
                 "max_load": pa.array([], type=pa.int64())}
            )
        load = batch.column("load").to_numpy(zero_copy_only=False)
        n_over = batch.column("n_over").to_numpy(zero_copy_only=False)
        normal = load[n_over == 0]
        return pa.table(
            {
                "packs": pa.array([batch.num_rows], type=pa.int64()),
                "max_load": pa.array(
                    [int(normal.max()) if len(normal) else 0],
                    type=pa.int64(),
                ),
            }
        )

    pstats = per_pack.map_batches(pack_fold, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    packs = sum(r["packs"] for r in pstats)
    max_load = max((r["max_load"] for r in pstats), default=0)
    # packing units = distinct batch keys in the pack_id layout (each
    # unit contributes >= 1 pack), exact regardless of block splits
    def unit_proj(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema([("unit", pa.int64())]).empty_table()
        pid = batch.column("pack_id").to_numpy(zero_copy_only=False)
        return pa.table({"unit": pa.array(np.unique(pid >> 20))})

    n_units = per_pack.map_batches(
        unit_proj, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("unit").count().count()
    # global exactly-once: distinct doc_ids == packed rows (the gate's
    # second exchange; in-block-only dup detection missed cross-block
    # duplicates, which would also collide pack-key spaces)
    n_distinct = packed.select_columns(["doc_id"]).groupby(
        "doc_id"
    ).count().count()
    lower = -(-tokens // capacity) if capacity else 0
    bound = 2 * lower + 2 * n_units + 2
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
