"""Exact-under-block-splits segment folds (round-4 hardening,
round-5 distributed residual).

Every sorted-block kernel in this repo folds per key segment inside
each sort-output block.  Ray's sort can split an equal-key run across
blocks whenever one key's rows exceed the block-size bound (the
measured fact behind ADVICE r3), which silently turns a per-segment
fold into a per-fragment fold.  ``exact_segment_fold`` removes the
assumption generically:

- because the input is GLOBALLY sorted, a key whose run splits is by
  contiguity the FIRST or LAST segment of every block containing it;
- so each block folds only its INTERIOR segments (complete by
  construction) and passes the raw rows of its two boundary segments
  through untouched;
- the boundary residual (rows of <= 2 keys per block) is re-folded
  ONCE per key with the same fold function, then unioned back.

Round-5 change (VERDICT r4 #1): the residual pass is DISTRIBUTED.
The residual grows with block count (~2 x avg-segment-rows x
n_blocks), so at 10^4-10^5 sorted blocks the old driver-only path
(sort + fold on the driver, hard 4M cap) became a routine refusal.
Now:

- residual <= ``driver_max`` rows (the overwhelmingly common case —
  a few boundary segments): folded on the driver exactly as before,
  no task overhead;
- above ``driver_max``: residual blocks are hash-partitioned BY KEY
  (deterministic ``pd.util.hash_pandas_object`` over the key
  columns, so every key's rows land in exactly one partition), and
  each partition is concat + sort + fold in ONE Ray task.  No cap:
  the exchange is bounded by the residual itself, and a hot key
  serializes into a single worker task (spillable worker memory, the
  same serialization its fold would need anywhere) instead of the
  driver heap.

Both paths preserve the output contract downstream folds rely on:
every key's folded rows live entirely in ONE output block.

Requirement on ``fold``: it reduces each key segment independently of
other segments (all call sites — candidate-pair generation, text
attach, pair verify, join merges — qualify), handles an empty input
table, and must not assume anything about order BETWEEN segments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# Driver path bound: residuals at or below this fold on the driver
# (one small sort, no extra tasks).  Above it the distributed pass
# takes over — there is no refusal cap any more.
DRIVER_RESIDUAL_MAX = 100_000
# Target rows per distributed residual-fold task.
RESIDUAL_ROWS_PER_TASK = 1_000_000
# Upper bound on residual partitions (fan-out sanity, not correctness).
RESIDUAL_MAX_TASKS = 128
# Upper bound on split (map-side) tasks: at 10^4-10^5 sorted blocks a
# task per residual block would mean ~10^5 submissions x up to 128
# returns each and reduce calls flattening ~10^5 arguments — residual
# blocks are grouped so the exchange is at most SPLIT x PARTITIONS
# objects regardless of upstream block count.
RESIDUAL_SPLIT_TASKS = 256

# Back-compat alias (r4 name; the refusal semantics are gone).
SEGMENT_FOLD_CAP = DRIVER_RESIDUAL_MAX


# Block budget multiplier for bounded_sort (x cluster CPUs).
SORT_BLOCKS_PER_CPU = 4


def bounded_sort(ds, keys, *, descending=None):
    """``Dataset.sort`` with the input block count bounded first.

    Ray's sort exchange moves O(B^2) inter-block slices, measured
    SUPER-LINEAR in block count on constant data (BASELINE r5: a
    10M-row sort costs 1.0 s at 128 input blocks, 7.3 s at 512,
    29.6 s at 1000, 124 s at 2000 on this host) — so a 100-TB input
    arriving as 10^4-10^5 read blocks must coalesce before any sort,
    or the exchange cost is set by block count rather than data size.
    The sort is a barrier anyway, so the concat repartition adds one
    cheap pipelined pass (the measured-faster move the extraction
    reassembly has used since r2).  Block budget = 4 x cluster CPUs,
    clamped to [16, 512]: parallelism is preserved because the sort
    emits as many blocks as it receives.

    OPT-IN, not auto-wired (r5 measured): a lazy Dataset's block
    count is unknowable without executing (``num_blocks`` requires a
    MaterializedDataset), and an UNCONDITIONAL repartition SPLITS
    already-coarse inputs upward — wiring this into every exchange
    sort cost 58 -> 98 s on the sf0.1 bench (extra operators are
    driver-dispatch-bound on short jobs, the documented ~5 tasks/s
    multi-operator rule).  Use it where the caller KNOWS the input
    arrives fragmented: reading 10^4+ small files, or any upstream
    whose block count scales with corpus size rather than cluster
    size."""
    import ray

    cpus = ray.cluster_resources().get("CPU", 8) if ray.is_initialized() else 8
    k = int(max(16, min(512, SORT_BLOCKS_PER_CPU * cpus)))
    ds = ds.repartition(k)
    if descending is None:
        return ds.sort(keys)
    return ds.sort(keys, descending=descending)


def _key_partition_ids(table: pa.Table, key_cols: list[str],
                       nparts: int) -> np.ndarray:
    """Deterministic partition id per row from the key columns only.

    ``pd.util.hash_pandas_object`` with the fixed default hash key is
    stable across processes and vectorized for both numeric and
    string keys; equal keys always hash equal, so a key's rows can
    never straddle two partitions.
    """
    import pandas as pd

    df = table.select(key_cols).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return (h.astype(np.uint64) % np.uint64(nparts)).astype(np.int64)


@ray.remote
def _split_residual_blocks(raw_schema: pa.Schema, key_cols: list[str],
                           nparts: int, *tables):
    """A GROUP of residual blocks -> ``nparts`` sub-tables routed by
    key hash.  Empty pass-through blocks (which can carry a
    zero-column schema) are dropped before the concat so the
    reduce-side schemas stay uniform."""
    tabs = [t.combine_chunks().cast(raw_schema)
            for t in tables if t.num_rows > 0]
    if not tabs:
        outs = [raw_schema.empty_table()] * nparts
    else:
        t = pa.concat_tables(tabs).combine_chunks()
        part = _key_partition_ids(t, key_cols, nparts)
        outs = [t.filter(pa.array(part == p)) for p in range(nparts)]
    return tuple(outs) if nparts > 1 else outs[0]


@ray.remote
def _fold_residual_partition(fold, key_cols: list[str],
                             out_schema: pa.Schema, *tables):
    """Concat one hash-partition's sub-tables, restore sort order, and
    run the SAME fold once — every key here is complete by routing."""
    tabs = [t for t in tables if t.num_rows > 0]
    if not tabs:
        return out_schema.empty_table()
    t = pa.concat_tables(tabs).sort_by(
        [(c, "ascending") for c in key_cols]
    ).combine_chunks()
    return fold(t).combine_chunks().cast(out_schema)


def _fold_residual_distributed(res_mat, *, n_rows: int,
                               key_cols: list[str], fold,
                               raw_schema: pa.Schema,
                               out_schema: pa.Schema,
                               rows_per_task: int):
    """Bounded second pass over the boundary residual: hash-exchange by
    key (map: split each residual block; reduce: one sort+fold task
    per partition).  Raw Ray tasks, not a Dataset sort — the exchange
    must CO-LOCATE equal keys unconditionally, which is exactly the
    property the surrounding machinery exists to avoid assuming of
    ``Dataset.sort``."""
    nparts = int(min(RESIDUAL_MAX_TASKS,
                     max(1, -(-n_rows // rows_per_task))))
    block_refs = res_mat.to_arrow_refs()
    # group residual blocks so the map side is at most
    # RESIDUAL_SPLIT_TASKS submissions and each reduce call takes at
    # most that many arguments, independent of upstream block count
    n_groups = min(len(block_refs), RESIDUAL_SPLIT_TASKS)
    per_group = -(-len(block_refs) // n_groups)
    per_part: list[list] = [[] for _ in range(nparts)]
    for g in range(n_groups):
        group = block_refs[g * per_group:(g + 1) * per_group]
        if not group:
            continue
        outs = _split_residual_blocks.options(
            num_returns=nparts
        ).remote(raw_schema, key_cols, nparts, *group)
        if nparts == 1:
            outs = [outs]
        for p, r in enumerate(outs):
            per_part[p].append(r)
    fold_ref = ray.put(fold)
    folded = [
        _fold_residual_partition.remote(
            fold_ref, key_cols, out_schema, *per_part[p]
        )
        for p in range(nparts)
    ]
    return ray.data.from_arrow_refs(folded)


def exact_segment_fold(sorted_ds, *, key_cols: list[str], fold,
                       raw_schema: pa.Schema, out_schema: pa.Schema,
                       driver_max: int | None = None,
                       cap: int | None = None,
                       rows_per_task: int = RESIDUAL_ROWS_PER_TASK,
                       op: str = "exact_segment_fold"):
    """Per-key-segment ``fold`` over a sorted Dataset, exact under
    equal-key block splits (module doc).  Returns a Dataset with
    ``out_schema`` rows.

    ``driver_max`` (alias ``cap``, r4 name) bounds only the DRIVER
    fast path; larger residuals run the distributed hash-partitioned
    pass instead of refusing.
    """
    from .dedup import _segment_bounds

    if driver_max is None:
        driver_max = DRIVER_RESIDUAL_MAX if cap is None else cap

    mixed_schema = pa.schema(
        [(f.name, f.type) for f in out_schema]
        + [("__r_" + f.name, f.type) for f in raw_schema]
        + [("__kind", pa.int8())]
    )

    def fold_block(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return mixed_schema.empty_table()
        batch = batch.combine_chunks()
        starts, ends = _segment_bounds(
            *[batch.column(c) for c in key_cols]
        )
        n = batch.num_rows
        boundary = np.zeros(n, dtype=bool)
        boundary[starts[0]:ends[0]] = True
        boundary[starts[-1]:ends[-1]] = True
        interior = batch.filter(pa.array(~boundary))
        raw = batch.filter(pa.array(boundary)).select(
            raw_schema.names
        ).cast(raw_schema).combine_chunks()
        out = fold(interior).combine_chunks()
        out_part = pa.table(
            {
                **{f.name: out.column(f.name) for f in out_schema},
                **{"__r_" + f.name: pa.nulls(out.num_rows, f.type)
                   for f in raw_schema},
                "__kind": pa.array(np.zeros(out.num_rows, dtype=np.int8)),
            }
        ).cast(mixed_schema)
        raw_part = pa.table(
            {
                **{f.name: pa.nulls(raw.num_rows, f.type)
                   for f in out_schema},
                **{"__r_" + f.name: raw.column(f.name)
                   for f in raw_schema},
                "__kind": pa.array(np.ones(raw.num_rows, dtype=np.int8)),
            }
        ).cast(mixed_schema)
        return pa.concat_tables([out_part, raw_part])

    folded = sorted_ds.map_batches(
        fold_block, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def keep_out(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return out_schema.empty_table()
        batch = batch.combine_chunks()
        return batch.filter(
            pc.equal(batch.column("__kind"), 0)
        ).select(out_schema.names).cast(out_schema)

    def keep_raw(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return raw_schema.empty_table()
        batch = batch.combine_chunks()
        sel = batch.filter(pc.equal(batch.column("__kind"), 1))
        return pa.table(
            {f.name: sel.column("__r_" + f.name) for f in raw_schema}
        ).cast(raw_schema)

    closed = folded.map_batches(keep_out, batch_format="pyarrow",
                                zero_copy_batch=True)
    res_mat = folded.map_batches(
        keep_raw, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_res = res_mat.count()
    if n_res == 0:
        return closed
    if n_res > driver_max:
        return closed.union(_fold_residual_distributed(
            res_mat, n_rows=n_res, key_cols=key_cols, fold=fold,
            raw_schema=raw_schema, out_schema=out_schema,
            rows_per_task=rows_per_task,
        ))
    # skip empty blocks: an empty input block can pass through the map
    # stage un-cast with a zero-column schema, which concat rejects
    rt = pa.concat_tables(
        [t.cast(raw_schema)
         for t in ray.get(res_mat.to_arrow_refs()) if t.num_rows > 0]
    ).sort_by(
        [(c, "ascending") for c in key_cols]
    ).combine_chunks()
    return closed.union(
        ray.data.from_arrow(fold(rt).combine_chunks().cast(out_schema))
    )
