"""Seeded stratified sampling — training-mix construction.

A pretraining data pipeline rarely trains on everything it crawls: it
draws a REPRODUCIBLE per-stratum sample (k documents per language /
source / quality bucket) to build the mix.  ``sample_stratified`` is
that operator: keep the k documents with the smallest seeded hash per
stratum — a deterministic uniform sample that is stable across runs,
cluster sizes and input orderings, and cheap to re-draw with a new
seed.

Scale plan (the reason this beats ``groupby().map_groups`` or a global
``sort(stratum, key)``):

1. **Partial top-k per input block** (``map_batches`` task): hash every
   row (exact mod-2^61-1 affine + square mix, vectorized on uint64 —
   the same ``_mulmod61`` kernel the fingerprints use) and keep only
   the k smallest per stratum IN the block.  Nothing else leaves the
   read stage: the exchange carries at most ``k x strata x blocks``
   rows of 3 scalar columns, independent of corpus size.
2. **Tree-reduce the candidates** — coalesce candidate blocks and
   re-apply the same keep-k kernel, then a single-block final pass
   ranks the winners.  NOT a sort exchange: a distributed sort on a
   low-cardinality stratum key (5 languages over hundreds of blocks)
   WOULD split equal keys across range partitions, so the sorted-block
   segment trick the other operators use is unsafe here; the candidate
   set is small by construction, so fan-in reduction is both safe and
   cheaper.  Intermediate fan-in keeps the biggest reduce task at
   ``k x strata x (blocks / fan_in)`` rows.

The hash chain is SQL-expressible in exact HUGEINT arithmetic, so the
operator is driver-oracle checkable end to end (same convention as
``rolling_fingerprint``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import _FP_MOD, _addmod61, _mulmod61

# fixed odd multiplier < 2^61-1; any constant works, but it is part of
# the cross-language contract (the SQL oracle hardcodes the same value)
SAMPLE_MULT = 1_234_567_890_123_456_789


def sample_keys(doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """Exact ((x+1)*A + seed) mod M, then a square mix (h*h + h) mod M —
    non-linear so sequential doc_ids don't sample as an arithmetic
    progression.  uint64 in, uint64 (< 2^61) out."""
    ids = np.asarray(doc_ids)
    if len(ids) and (
        ids.min() < 0 or np.uint64(ids.max()) >= np.uint64(_FP_MOD - 1)
    ):
        # _mulmod61 is exact only for operands < 2^61: a negative id
        # would wrap through the uint64 cast and a >= 2^61-1 id would
        # overflow the split — either silently diverges from the
        # HUGEINT SQL oracle, so refuse loudly instead
        raise ValueError(
            "sample_keys requires 0 <= doc_id < 2^61-2; reduce or remap "
            "ids first"
        )
    x = ids.astype(np.uint64) + np.uint64(1)
    h1 = _addmod61(_mulmod61(x, np.uint64(SAMPLE_MULT)),
                   np.uint64(seed % _FP_MOD))
    return _addmod61(_mulmod61(h1, h1), h1)


def _keep_k_block(batch: pa.Table, *, stratum_col: str, k: int,
                  with_rank: bool) -> pa.Table:
    """(stratum, doc_id, sample_key) rows → the k smallest keys per
    stratum present in THIS block, vectorized: one lexsort + segment
    position mask, no per-group Python."""
    fields = [(stratum_col, pa.string()), ("doc_id", pa.int64()),
              ("sample_key", pa.int64())]
    if with_rank:
        fields.append(("rn", pa.int64()))
    schema = pa.schema(fields)
    if batch.num_columns == 0 or batch.num_rows == 0:
        return schema.empty_table()
    batch = batch.combine_chunks()
    strat = np.asarray(batch.column(stratum_col).to_pylist(), dtype=object)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    key = batch.column("sample_key").to_numpy(zero_copy_only=False)
    # lexsort: last key is primary → (stratum, key, doc_id)
    order = np.lexsort((ids, key, strat))
    strat, ids, key = strat[order], ids[order], key[order]
    n = len(strat)
    seg_start = np.empty(n, dtype=bool)
    seg_start[0] = True
    seg_start[1:] = strat[1:] != strat[:-1]
    # position within the stratum segment, vectorized
    start_idx = np.maximum.accumulate(
        np.where(seg_start, np.arange(n), -1)
    )
    pos = np.arange(n) - start_idx
    keep = pos < k
    cols = {
        stratum_col: pa.array(list(strat[keep]), type=pa.string()),
        "doc_id": pa.array(ids[keep], type=pa.int64()),
        "sample_key": pa.array(key[keep].astype(np.int64),
                               type=pa.int64()),
    }
    if with_rank:
        cols["rn"] = pa.array(pos[keep] + 1, type=pa.int64())
    return pa.table(cols).cast(schema)


def sample_stratified(docs, *, stratum_col: str = "lang", k: int = 20,
                      seed: int = 0, fan_in: int = 64):
    """documents Dataset → (stratum, doc_id, sample_key, rn): the k
    smallest-hash documents per stratum, rn = 1..k ordered by
    (sample_key, doc_id).  Deterministic for a (corpus, seed) pair,
    independent of block layout (min-k is associative, so the
    tree-reduce commutes with any partitioning)."""

    def hash_and_prune(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keyed = pa.table(
            {
                stratum_col: batch.column(stratum_col),
                "doc_id": batch.column("doc_id"),
                "sample_key": pa.array(
                    sample_keys(ids, seed).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )
        return _keep_k_block(keyed, stratum_col=stratum_col, k=k,
                             with_rank=False)

    candidates = docs.map_batches(hash_and_prune, batch_format="pyarrow",
                                  zero_copy_batch=True)
    # intermediate fan-in bounds the final task: without it, a corpus
    # read as B blocks would funnel k x strata x B candidate rows into
    # ONE reduce task (at 10^6 blocks that is 10^8 rows); with it the
    # biggest task sees k x strata x (B / fan_in)
    reduced = candidates.repartition(fan_in).map_batches(
        lambda b: _keep_k_block(b, stratum_col=stratum_col, k=k,
                                with_rank=False),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return reduced.repartition(1).map_batches(
        lambda b: _keep_k_block(b, stratum_col=stratum_col, k=k,
                                with_rank=True),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def mix_by_rate(docs, *, rates_bp: dict, default_bp: int = 10000,
                seed: int = 0, source_col: str = "source"):
    """Rate-based corpus mixing: keep each document with its source's
    sampling rate — the Pile/Dolma-style mix step that up/down-weights
    sources in a training corpus, as a deterministic hash filter.

    A doc survives iff ``sample_keys(doc_id, seed) < M * bp // 10000``
    for its source's rate in basis points.  Thresholds are EXACT
    integer arithmetic (``(M * bp) // 10000`` in Python ints / DuckDB
    HUGEINT) — a float ``rate * M`` would round differently across
    engines at the boundary.  Pure per-block filter: no exchange, no
    state, reproducible for a (corpus, seed) pair, and rates compose
    with a later seed change for a fresh draw.
    """
    thresholds = {
        src: np.uint64((_FP_MOD * int(bp)) // 10000)
        for src, bp in rates_bp.items()
    }
    default_thr = np.uint64((_FP_MOD * int(default_bp)) // 10000)

    def keep(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keys = sample_keys(ids, seed)
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        dic = src.dictionary_encode()
        codes = np.asarray(dic.indices, dtype=np.int64)
        thr_of_code = np.array(
            [thresholds.get(v, default_thr)
             for v in dic.dictionary.to_pylist()],
            dtype=np.uint64,
        )
        return batch.filter(pa.array(keys < thr_of_code[codes]))

    return docs.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)


def hash_split(docs, *, splits=(("train", 9000), ("val", 500),
                                ("test", 500)),
               seed: int = 3141, id_col: str = "doc_id"):
    """Deterministic train/val/test assignment: each document lands in
    exactly one split by its exact hash key — the leakage-proof corpus
    split (membership is a pure function of (id, seed), so re-running
    over more shards, a different partitioning, or a grown corpus
    never moves a previously-assigned document between splits).

    Fractions are integer basis points summing to 10000; boundaries
    are cumulative ``(M * cum_bp) // 10000`` thresholds in exact
    integer arithmetic (the ``mix_by_rate`` convention — HUGEINT-
    recomputable in SQL, no float boundary drift).  One exchange-free
    streaming pass appending a ``split`` column.
    """
    names = [n for n, _ in splits]
    bps = [int(bp) for _, bp in splits]
    if sum(bps) != 10000:
        raise ValueError(f"split basis points must sum to 10000: {bps}")
    cum = np.cumsum(bps)[:-1]
    bounds = np.array([(_FP_MOD * int(c)) // 10000 for c in cum],
                      dtype=np.uint64)
    names_arr = pa.array(names, type=pa.string())

    def assign(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch.append_column(
                "split", pa.array([], type=pa.string()))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(bounds, sample_keys(ids, seed),
                              side="right")
        return batch.append_column(
            "split", names_arr.take(pa.array(idx, type=pa.int64())))

    return docs.map_batches(assign, batch_format="pyarrow",
                            zero_copy_batch=True)


def epoch_shuffle(docs, *, seed: int, n_shards: int,
                  id_col: str = "doc_id"):
    """Deterministic seeded global shuffle for a training epoch:
    (doc_id, shard, sample_key, pos) where ``shard = sample_keys(id,
    seed) % n_shards`` and ``pos`` is the doc's rank within its shard
    ordered by (sample_key, doc_id) — the reader streams shard files
    in pos order and gets the same shuffled curriculum on ANY cluster
    shape, any epoch replay.

    Plan: the keying pass is exchange-free (same ``sample_keys``
    contract as ``hash_split`` — affine + square mix mod 2^61-1,
    HUGEINT-recomputable in SQL); the ONLY exchange is the
    n_shards-way groupby, and each shard orders locally in one task.
    Size ``n_shards`` so corpus/n_shards fits a worker — the same
    contract as packed-shard export (``state/runner.py`` --job
    export); at 100 TB that means thousands of shards, which is also
    what the training loader wants.
    """

    def key_batch(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keys = sample_keys(ids, seed)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "shard": pa.array(
                    (keys % np.uint64(n_shards)).astype(np.int64)),
                "sample_key": pa.array(keys.astype(np.int64)),
            }
        )

    def order_shard(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        keys = group.column("sample_key").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        rank = np.lexsort((ids, keys))
        pos = np.empty(len(ids), dtype=np.int64)
        pos[rank] = np.arange(len(ids), dtype=np.int64)
        return group.append_column("pos", pa.array(pos))

    return (
        docs.map_batches(key_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("shard")
        .map_groups(order_shard, batch_format="pyarrow")
    )


def temperature_rates(docs, *, stratum_col: str = "lang",
                      floor_bp: int = 1) -> dict:
    """Per-stratum sampling rates for temperature mixing at alpha=0.5
    (the mC4/XLM-R multilingual rebalance: sample stratum s with
    probability proportional to ``count_s**(alpha-1)``, so the kept
    corpus approaches ``count_s**alpha``).  The smallest stratum keeps
    everything (10000 bp); a stratum k-times larger keeps
    ``floor(10000 * sqrt(1/k))`` bp.

    alpha is PINNED at 0.5 because IEEE-754 requires ``sqrt`` (and
    division) to be exactly rounded — numpy/Python and DuckDB produce
    bit-identical doubles, so the basis-point cut is reproducible in
    the SQL oracle.  A general ``pow(x, alpha)`` carries no such
    guarantee across engines; generalizing needs a rational-exponent
    integer scheme.

    The count pass ships one (stratum, n) row per block — strata are a
    bounded dimension (languages/sources), so the driver combine is
    O(strata x blocks).  Compose with ``mix_by_rate`` for the
    exchange-free apply.
    """
    import math

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(stratum_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals, counts = np.unique(
            np.asarray(col.to_pylist(), dtype=object), return_counts=True
        )
        return pa.table(
            {
                stratum_col: pa.array([str(v) for v in vals]),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    totals: dict = {}
    for row in docs.select_columns([stratum_col]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all():
        totals[row[stratum_col]] = totals.get(row[stratum_col], 0) + row["n"]
    if not totals:
        return {}
    cmin = min(totals.values())
    return {
        s: max(floor_bp, int(math.floor(10000.0 * math.sqrt(cmin / c))))
        for s, c in totals.items()
    }
