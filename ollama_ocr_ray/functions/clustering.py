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


# --- distributed Lloyd k-means on the exact integer lattice ------------------

KMEANS_SCALE = GRAM_SCALE  # the coarse 2^10 lattice buys sum headroom

ASSIGN_KM_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("cluster", pa.int64()), ("d2", pa.int64())]
)


def _km_quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(
        mat.astype(np.float64) * float(KMEANS_SCALE) + 0.5
    ).astype(np.int64)


def _km_assign_block(q: np.ndarray, cmat: np.ndarray,
                     cc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster index int64[n], squared distance TERMS int64[n]) for one
    quantized block: argmin_j (c_j.c_j - 2 q.c_j) — the q.q term is
    cluster-independent so the argmin drops it; the returned d2 adds it
    back so callers get true squared lattice distances."""
    cross = q @ cmat.T  # int64-exact (|q|,|c| < 2^12, d<=2^10 => <2^34)
    score = cc[None, :] - 2 * cross
    best = np.argmin(score, axis=1)  # first min => smallest cluster id
    qq = np.einsum("ij,ij->i", q, q)
    d2 = qq + score[np.arange(len(q)), best]
    return best.astype(np.int64), d2


def kmeans_lattice(embeddings, *, k: int = 8, iters: int = 4):
    """Distributed Lloyd k-means over the ``embedding`` column with a
    fully pinned EXACT integer contract, so the result is independent
    of partitioning, block order, and arrival order:

    - inputs quantize to the floor(x*2^10 + 0.5) lattice (coarse scale
      = sum headroom: coordinate sums stay < 2^12 x n_rows, exact in
      int64 up to ~2^51 rows);
    - seeds are the ``k`` smallest ``vec_id`` rows (partial bottom-k,
      no sort);
    - assignment is an exact int64 argmin of ||q - c||^2 with ties to
      the smallest cluster index;
    - the update keeps each cluster's EXACT integer coordinate sums
      and re-quantizes the mean back onto the lattice with
      round-half-up: floor((2*sum + n) // (2*n)) — deterministic for
      either sign; an empty cluster keeps its previous centroid.

    Scale design: each iteration is ONE streaming pass; the only data
    leaving a block is k rows of (cluster, n, sum[d], d2) partials —
    k x blocks rows to the driver, merged exactly in integers (the
    classic mergeable-partials shape; never a shuffle of the vectors).

    Returns ``(assign_ds, centroids, objectives)``: the final
    assignment Dataset (vec_id, cluster, d2 — exact squared LATTICE
    distance), the final int64 centroid matrix (k x d), and the exact
    int objective (sum of d2) after each assignment pass.
    """
    part_schema = pa.schema(
        [("cluster", pa.int64()), ("n", pa.int64()),
         ("s", pa.list_(pa.int64())), ("d2", pa.int64())]
    )

    _, cmat0 = seed_centroids(embeddings, k)
    # seed_centroids quantizes at 2^20; recover floats exactly and
    # re-quantize on the k-means lattice (both scales are powers of 2).
    cmat = np.floor(
        cmat0.astype(np.float64) * (KMEANS_SCALE / QUANT_SCALE) + 0.5
    ).astype(np.int64)
    if len(cmat) < k:
        raise ValueError(
            f"kmeans_lattice: k={k} but only {len(cmat)} distinct "
            "seed rows available"
        )

    objectives: list[int] = []
    for _ in range(iters):
        cmat_b = cmat  # rebind so each closure captures THIS iteration
        cc = np.einsum("ij,ij->i", cmat_b, cmat_b)

        def partial(batch: pa.Table, _c=cmat_b, _cc=cc) -> pa.Table:
            batch = batch.combine_chunks()
            if len(batch) == 0:
                return part_schema.empty_table()
            col = batch.column("embedding").combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            q = _km_quantize(flat.reshape(len(batch), -1))
            best, d2 = _km_assign_block(q, _c, _cc)
            rows = {"cluster": [], "n": [], "s": [], "d2": []}
            for j in np.unique(best):
                m = best == j
                rows["cluster"].append(int(j))
                rows["n"].append(int(m.sum()))
                rows["s"].append(q[m].sum(axis=0).tolist())
                rows["d2"].append(int(d2[m].sum()))
            return pa.table(
                {
                    "cluster": pa.array(rows["cluster"], type=pa.int64()),
                    "n": pa.array(rows["n"], type=pa.int64()),
                    "s": pa.array(rows["s"], type=pa.list_(pa.int64())),
                    "d2": pa.array(rows["d2"], type=pa.int64()),
                }
            )

        parts = embeddings.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        ns = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, cmat.shape[1]), dtype=np.int64)
        obj = 0
        for r in parts:
            j = r["cluster"]
            ns[j] += r["n"]
            sums[j] += np.asarray(r["s"], dtype=np.int64)
            obj += r["d2"]
        objectives.append(int(obj))
        new = cmat.copy()
        live = ns > 0
        # round-half-up mean back onto the lattice, exact in integers
        new[live] = (2 * sums[live] + ns[live, None]) // (
            2 * ns[live, None]
        )
        cmat = new

    cmat_f = cmat
    cc_f = np.einsum("ij,ij->i", cmat_f, cmat_f)

    def assign(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if len(batch) == 0:
            return ASSIGN_KM_SCHEMA.empty_table()
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        q = _km_quantize(flat.reshape(len(batch), -1))
        best, d2 = _km_assign_block(q, cmat_f, cc_f)
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64)),
                "cluster": pa.array(best),
                "d2": pa.array(d2),
            }
        )

    assign_ds = embeddings.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
    return assign_ds, cmat, objectives


def kmeans_lattice_reference(vec_ids, mat, *, k: int = 8,
                             iters: int = 4):
    """Single-process reference for the SAME pinned contract (used by
    the ``kmeans_gate`` query and tests; deliberately a separate,
    straight-line implementation).  Returns (assign dict vec_id ->
    (cluster, d2), centroids, objectives)."""
    order = np.argsort(vec_ids)[:k]
    q = _km_quantize(np.asarray(mat, dtype=np.float64))
    cmat = np.floor(
        _quantize(np.asarray(mat, dtype=np.float64)[order]).astype(
            np.float64
        ) * (KMEANS_SCALE / QUANT_SCALE) + 0.5
    ).astype(np.int64)
    objectives = []
    for _ in range(iters):
        cc = np.einsum("ij,ij->i", cmat, cmat)
        score = cc[None, :] - 2 * (q @ cmat.T)
        best = np.argmin(score, axis=1)
        qq = np.einsum("ij,ij->i", q, q)
        d2 = qq + score[np.arange(len(q)), best]
        objectives.append(int(d2.sum()))
        new = cmat.copy()
        for j in range(k):
            m = best == j
            n = int(m.sum())
            if n:
                s = q[m].sum(axis=0)
                new[j] = (2 * s + n) // (2 * n)
        cmat = new
    cc = np.einsum("ij,ij->i", cmat, cmat)
    score = cc[None, :] - 2 * (q @ cmat.T)
    best = np.argmin(score, axis=1)
    qq = np.einsum("ij,ij->i", q, q)
    d2 = qq + score[np.arange(len(q)), best]
    assign = {
        int(v): (int(b), int(x))
        for v, b, x in zip(vec_ids, best, d2)
    }
    return assign, cmat, objectives


# --- PCA projection over the exact integer scatter ---------------------------

PCA_SCALE = 1 << 20  # eigenvectors are unit-norm: |v| <= 1, exact headroom

PROJ_SCHEMA_COLS = ("vec_id",)  # + pc0..pc{r-1} int64


def scatter_stats(embeddings) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, coordinate sums int64[d], gram int64[d, d]) over the
    floor(x*2^10 + 0.5) lattice — ONE streaming pass; each block emits
    a single row {n, s, g-upper-triangle} (size independent of row
    count), merged on the driver in exact Python/np integers."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dim = len(col[0]) if len(col) else 0
        if dim == 0 or len(batch) == 0:
            return pa.table(
                {"n": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.list_(pa.int64())),
                 "g": pa.array([], type=pa.list_(pa.int64()))}
            )
        q = np.floor(
            flat.reshape(len(batch), dim).astype(np.float64)
            * float(GRAM_SCALE) + 0.5
        )
        g = q.T @ q  # float64-exact (gram_matrix docstring bound)
        iu, ju = np.triu_indices(dim)
        return pa.table(
            {
                "n": pa.array([len(batch)], type=pa.int64()),
                "s": pa.array([q.sum(axis=0).astype(np.int64).tolist()],
                              type=pa.list_(pa.int64())),
                "g": pa.array([g[iu, ju].astype(np.int64).tolist()],
                              type=pa.list_(pa.int64())),
            }
        )

    rows = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not rows:
        raise ValueError("scatter_stats: empty embeddings dataset")
    dim = len(rows[0]["s"])
    n = 0
    s = np.zeros(dim, dtype=np.int64)
    gu = np.zeros(dim * (dim + 1) // 2, dtype=np.int64)
    for r in rows:
        n += int(r["n"])
        s += np.asarray(r["s"], dtype=np.int64)
        gu += np.asarray(r["g"], dtype=np.int64)
    g = np.zeros((dim, dim), dtype=np.int64)
    iu, ju = np.triu_indices(dim)
    g[iu, ju] = gu
    g[ju, iu] = gu
    return n, s, g


def principal_axes(n: int, s: np.ndarray, g: np.ndarray,
                   r: int) -> np.ndarray:
    """Quantized top-``r`` eigenvectors (int64[r, d] on the 2^20
    lattice) of the exact integer scatter ``n*G - s s^T``.  PURE
    driver-side contract shared by the distributed plan and the
    reference (the spec.py rule: the eigen step is a deterministic
    function of the exact integer scatter; the INDEPENDENT halves are
    the scatter aggregation and the projection pass).  Sign pinned:
    each eigenvector's largest-|coordinate| entry is made positive
    (first index on ties)."""
    scatter = (n * g.astype(object) - np.outer(s, s).astype(object))
    mat = scatter.astype(np.float64) / float(n)
    w, v = np.linalg.eigh(mat)
    order = np.argsort(w)[::-1][:r]
    axes = v[:, order].T.copy()
    for i in range(len(axes)):
        j = int(np.argmax(np.abs(axes[i])))
        if axes[i, j] < 0:
            axes[i] = -axes[i]
    return np.floor(
        axes * float(PCA_SCALE) + 0.5
    ).astype(np.int64)


def pca_project(embeddings, *, r: int = 2):
    """(vec_id, pc0..pc{r-1}) — the UNCENTERED exact integer
    projection ``q @ P^T`` of every quantized vector onto the
    quantized principal axes (centering is a constant shift per
    component: ``(s @ P^T) / n``, returned by ``scatter_stats`` +
    ``principal_axes`` callers who need it; keeping the distributed
    output uncentered keeps it EXACT in int64 — |q| < 2^12 x |P| <=
    2^20 x d <= 2^10 gives < 2^42).

    Scale design: one scatter pass (one d^2 row per block), an O(d^2)
    driver eigensolve, then ONE exchange-free projection pass with the
    r x d axis matrix broadcast by closure."""
    n, s, g = scatter_stats(embeddings)
    axes = principal_axes(n, s, g, r)
    axes_t = np.ascontiguousarray(axes.T)

    def project(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        cols = {"vec_id": pa.array(ids.astype(np.int64))}
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dim = len(col[0]) if len(col) else axes_t.shape[0]
        q = np.floor(
            flat.reshape(len(batch), dim).astype(np.float64)
            * float(GRAM_SCALE) + 0.5
        ).astype(np.int64)
        y = q @ axes_t  # int64-exact (see docstring bound)
        for i in range(axes_t.shape[1]):
            cols[f"pc{i}"] = pa.array(y[:, i])
        return pa.table(cols)

    return embeddings.map_batches(project, batch_format="pyarrow",
                                  zero_copy_batch=True)


def pca_project_reference(vec_ids, mat, *, r: int = 2):
    """Single-process reference: brute-force exact scatter from the
    raw matrix, the SAME principal_axes contract, straight-line
    projection.  Returns {vec_id: (pc0, ..)}."""
    q = np.floor(
        np.asarray(mat, dtype=np.float64) * float(GRAM_SCALE) + 0.5
    ).astype(np.int64)
    n = len(q)
    s = q.sum(axis=0)
    g = q.T @ q
    axes = principal_axes(n, s, g, r)
    y = q @ axes.T
    return {int(v): tuple(int(x) for x in row)
            for v, row in zip(vec_ids, y)}
