"""Exact-integer nearest-centroid topic assignment over an embedding
column (``list<float>``).

The real-world operation: bucketing a corpus by embedding similarity
to a small set of anchor vectors — topic routing before per-topic
quality rules, cluster-balanced sampling, or the assignment pass of
SemDeDup-style semantic dedup (``similarity.semdedup_pairs_clustered``
runs the same pass with float centroids it learned itself; this module
is the USER-FACING variant with a pinned, oracle-checkable contract).

Exact-oracle form: cosine/argmax over float dot products is not
bit-reproducible across BLAS implementations, so both sides quantize
first::

    q(x) = floor(x * 2^20 + 0.5)   (int64)

2^20 is a power of two, so ``x * 2^20`` is EXACT for every float32
input (exponent shift in float64), the +0.5/floor is exact at these
magnitudes, and the dot products are pure int64 sums (|x| < 4, dim
64 → |dp| < 2^50, no overflow).  The assignment is then a
deterministic integer argmax with ties to the smallest centroid id —
DuckDB re-derives the identical numbers (see ``queries.py``
``topic_assign``).

Scale design:

- Seed centroids are the ``k`` smallest ``vec_id`` rows — found with a
  per-block partial bottom-k (k × blocks rows to the driver, never a
  sort), quantized once, and broadcast to the assignment tasks by
  closure capture (k × dim int64 ≈ KBs).
- Assignment is ONE exchange-free streaming pass: per block, an int64
  matmul against the broadcast centroid matrix.  numpy integer matmul
  is exact (no BLAS float path).
- ``cluster_purity`` reduces the assignment to (topic, label) counts —
  a k × |labels| exchange — and folds each topic's modal label.

At 100 TB the centroid matrix is still KBs and assignment stays
exchange-free; only the k × |labels| purity table moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUANT_SCALE = 1 << 20

ASSIGN_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("topic", pa.int64()), ("dp", pa.int64())]
)


def _quantize(mat: np.ndarray) -> np.ndarray:
    """float matrix → exact int64 lattice: floor(x * 2^20 + 0.5)."""
    return np.floor(
        mat.astype(np.float64) * float(QUANT_SCALE) + 0.5
    ).astype(np.int64)


def _batch_qmatrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_id int64[n], quantized int64[n, d]) for one block."""
    batch = batch.combine_chunks()
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    col = batch.column("embedding").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    dim = len(col[0]) if len(col) else 0
    mat = flat.reshape(len(ids), dim) if dim else np.zeros((len(ids), 0))
    return ids.astype(np.int64), _quantize(mat)


def seed_centroids(embeddings, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(centroid_ids int64[k], quantized matrix int64[k, d]) — the
    ``k`` smallest ``vec_id`` rows, via a per-block partial bottom-k
    (the exchange and the driver collect are k × blocks rows; no
    sort, no full materialization)."""

    def bottom_k(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        order = pc.sort_indices(
            batch, sort_keys=[("vec_id", "ascending")]
        )
        return batch.take(order[: k])

    rows = (
        embeddings.map_batches(bottom_k, batch_format="pyarrow",
                               zero_copy_batch=True)
        .take_all()
    )
    rows.sort(key=lambda r: r["vec_id"])
    rows = rows[:k]
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = _quantize(np.array([r["embedding"] for r in rows],
                             dtype=np.float64))
    return ids, mat


def centroid_assign(embeddings, *, k: int = 8, keep_cols: tuple = ()):
    """(vec_id, topic, dp[, keep_cols…]) for every vector: ``topic`` is
    the seed centroid's vec_id with the largest exact quantized dot
    product (ties → smallest centroid id), ``dp`` that product."""
    cids, cmat = seed_centroids(embeddings, k)
    cmat_t = np.ascontiguousarray(cmat.T)

    def assign(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ids, q = _batch_qmatrix(batch)
        dots = q @ cmat_t  # int64-exact; (n, k)
        # argmax picks the FIRST max; cids is sorted ascending, so ties
        # resolve to the smallest centroid id.
        best = np.argmax(dots, axis=1)
        cols = {
            "vec_id": pa.array(ids),
            "topic": pa.array(cids[best]),
            "dp": pa.array(dots[np.arange(len(ids)), best]),
        }
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return embeddings.map_batches(assign, batch_format="pyarrow",
                                  zero_copy_batch=True)


def cluster_purity(embeddings, *, k: int = 8):
    """Per topic: (topic, n_vecs, top_label, top_n) — the modal
    ``label`` of each centroid's assigned vectors (ties → smallest
    label).  One (topic, label)-sized exchange after the exchange-free
    assignment pass."""
    from ray.data.aggregate import Sum

    assigned = centroid_assign(embeddings, k=k, keep_cols=("label",))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        g = (
            pa.table({"topic": batch.column("topic"),
                      "label": batch.column("label").cast(pa.int64())})
            .group_by(["topic", "label"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"topic": g.column("topic"),
                         "label": g.column("label"),
                         "n": g.column("count_all").cast(pa.int64())})

    def finish(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        ns = group.column("n").to_numpy(zero_copy_only=False)
        labels = group.column("label").to_numpy(zero_copy_only=False)
        order = np.lexsort((labels, -ns))
        return pa.table(
            {
                "topic": group.column("topic").slice(0, 1),
                "n_vecs": pa.array([int(ns.sum())], type=pa.int64()),
                "top_label": pa.array([int(labels[order[0]])],
                                      type=pa.int64()),
                "top_n": pa.array([int(ns[order[0]])], type=pa.int64()),
            }
        )

    return (
        assigned.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby(["topic", "label"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("topic")
        .map_groups(finish, batch_format="pyarrow")
    )


GRAM_SCALE = 1 << 10

GRAM_SCHEMA = pa.schema(
    [("i", pa.int64()), ("j", pa.int64()), ("g", pa.int64())]
)


def gram_matrix(embeddings):
    """Exact distributed Gram matrix of the quantized embedding column:
    ``g[i, j] = sum_rows q_r[i] * q_r[j]`` on the floor(x*2^10 + 0.5)
    lattice, upper triangle (i <= j) as (i, j, g) rows — the building
    block for covariance/PCA/whitening over an embedding corpus.

    Scale design: per block ONE d x d partial (the only thing entering
    the exchange — independent of row count), merged by a d^2-group
    sum.  The per-block fold runs as a float64 BLAS matmul, which is
    EXACT here: with |x| < 4 each quantized value is < 2^12, each
    product < 2^24, and a block partial stays below 2^53 up to ~2^29
    rows per block; the global merge is int64 (headroom ~2^39 more
    rows at worst-case magnitudes — the coarser 2^10 lattice vs the
    assignment pass's 2^20 buys exactly this).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dim = len(col[0]) if len(col) else 0
        if dim == 0 or len(batch) == 0:
            return GRAM_SCHEMA.empty_table()
        q = np.floor(
            flat.reshape(len(batch), dim).astype(np.float64)
            * float(GRAM_SCALE) + 0.5
        )
        g = q.T @ q  # float64-exact (see docstring bound)
        iu, ju = np.triu_indices(dim)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "g": pa.array(g[iu, ju].astype(np.int64)),
            }
        )

    return (
        embeddings.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        .groupby(["i", "j"])
        .aggregate(Sum("g", alias_name="g"))
    )
