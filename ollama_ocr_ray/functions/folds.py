"""Exact-under-block-splits segment folds (round-4 hardening).

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
- the bounded residual (rows of <= 2 keys per block, capped with a
  loud error) is re-sorted and folded ONCE on the driver with the
  same fold function, then unioned back.

Requirement on ``fold``: it reduces each key segment independently of
other segments (all four call sites — candidate-pair generation,
text attach, pair verify — qualify), handles an empty input table,
and must not assume anything about order BETWEEN segments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

SEGMENT_FOLD_CAP = 4_000_000  # driver bound on residual boundary rows


def exact_segment_fold(sorted_ds, *, key_cols: list[str], fold,
                       raw_schema: pa.Schema, out_schema: pa.Schema,
                       cap: int = SEGMENT_FOLD_CAP,
                       op: str = "exact_segment_fold"):
    """Per-key-segment ``fold`` over a sorted Dataset, exact under
    equal-key block splits (module doc).  Returns a Dataset with
    ``out_schema`` rows."""
    from .dedup import _segment_bounds

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
    residual = folded.map_batches(
        keep_raw, batch_format="pyarrow", zero_copy_batch=True
    ).limit(cap + 1).take_all()
    if len(residual) > cap:
        raise RuntimeError(
            f"{op}: boundary-segment residual exceeds the driver cap "
            f"({cap} rows; keys {key_cols}); salt the hot key or raise "
            "target_max_block_size"
        )
    if not residual:
        return closed
    rt = pa.Table.from_pylist(residual, schema=raw_schema).sort_by(
        [(c, "ascending") for c in key_cols]
    ).combine_chunks()
    return closed.union(
        ray.data.from_arrow(fold(rt).combine_chunks().cast(out_schema))
    )
