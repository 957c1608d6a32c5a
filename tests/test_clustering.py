"""Quantized nearest-centroid assignment (functions/clustering.py) and
grouped percent rank (sketches.grouped_percent_rank): brute-force
parity, tie rules, partitioning invariance."""

import numpy as np
import pyarrow as pa
import pytest

from ollama_ocr_ray.functions.clustering import (
    QUANT_SCALE,
    centroid_assign,
    cluster_purity,
    seed_centroids,
)
from ollama_ocr_ray.functions.sketches import grouped_percent_rank

RNG = np.random.default_rng(7)
DIM = 6
N = 40
VEC_IDS = np.array([5, 0, 3, 1, 9, 2] + list(range(10, 10 + N - 6)),
                   dtype=np.int64)
MAT = RNG.normal(scale=0.4, size=(N, DIM)).astype(np.float32)
# force an exact dot-product tie between centroids 0 and 1 for one row:
# centroids are the k smallest vec_ids (0,1,2); make rows of vec_id 0
# and 1 identical so every vector ties on them equally... instead make
# one PROBE row orthogonal-equal: simplest exact tie is the zero vector
# (dp = 0 with every centroid).
MAT[6] = 0.0
LABELS = (VEC_IDS % 3).astype(np.int32)


def _table():
    return pa.table(
        {
            "vec_id": pa.array(VEC_IDS),
            "embedding": pa.array([list(map(float, r)) for r in MAT],
                                  type=pa.list_(pa.float32())),
            "label": pa.array(LABELS, type=pa.int32()),
        }
    )


def _quant(m):
    return np.floor(m.astype(np.float64) * QUANT_SCALE + 0.5).astype(
        np.int64
    )


def _brute_assign(k=3):
    order = np.argsort(VEC_IDS)[:k]
    cids = VEC_IDS[order]
    cmat = _quant(MAT[order])
    q = _quant(MAT)
    dots = q @ cmat.T
    best = np.argmax(dots, axis=1)
    return {
        int(v): (int(cids[b]), int(dots[i, b]))
        for i, (v, b) in enumerate(zip(VEC_IDS, best))
    }


def _collect(ds):
    t = pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    return t.to_pylist()


@pytest.mark.parametrize("nblocks", [1, 5])
def test_centroid_assign_brute_force(ray_session, nblocks):
    import ray.data as rd

    ds = rd.from_arrow(_table()).repartition(nblocks)
    got = {r["vec_id"]: (r["topic"], r["dp"])
           for r in _collect(centroid_assign(ds, k=3))}
    assert got == _brute_assign(3)


def test_zero_vector_ties_to_smallest_centroid(ray_session):
    import ray.data as rd

    got = {r["vec_id"]: r for r in
           _collect(centroid_assign(rd.from_arrow(_table()), k=3))}
    # VEC_IDS[6] = 10 is the zero vector: dp 0 with every centroid
    assert got[10]["dp"] == 0 and got[10]["topic"] == 0


def test_seed_centroids_partial_bottom_k(ray_session):
    import ray.data as rd

    ids, cmat = seed_centroids(rd.from_arrow(_table()).repartition(7), 3)
    assert list(ids) == [0, 1, 2]
    order = np.argsort(VEC_IDS)[:3]
    assert np.array_equal(cmat, _quant(MAT[order]))


def test_cluster_purity_brute_force(ray_session):
    import ray.data as rd

    assign = _brute_assign(3)
    exp = {}
    for vid, (topic, _) in assign.items():
        lab = int(LABELS[list(VEC_IDS).index(vid)])
        exp.setdefault(topic, {}).setdefault(lab, 0)
        exp[topic][lab] += 1
    want = {}
    for topic, labs in exp.items():
        top_label, top_n = sorted(labs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[topic] = (sum(labs.values()), top_label, top_n)

    got = {r["topic"]: (r["n_vecs"], r["top_label"], r["top_n"])
           for r in _collect(cluster_purity(rd.from_arrow(_table()), k=3))}
    assert got == want


# --- grouped percent rank ---------------------------------------------------

PR_ROWS = [
    (0, "en", 10), (1, "en", 20), (2, "en", 20), (3, "en", 30),
    (4, "de", 5), (5, "de", 5), (6, "de", 5),
    (7, "fr", 1),
]


def _pr_table():
    ids, keys, vals = zip(*PR_ROWS)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "lang": pa.array(keys),
            "n_chars": pa.array(vals, type=pa.int64()),
        }
    )


def _pr_brute():
    out = {}
    for i, k, v in PR_ROWS:
        grp = [x for x in PR_ROWS if x[1] == k]
        below = sum(1 for x in grp if x[2] < v)
        out[i] = below * 10_000 // len(grp)
    return out


@pytest.mark.parametrize("nblocks", [1, 4])
def test_percent_rank_brute_force(ray_session, nblocks):
    import ray.data as rd

    ds = rd.from_arrow(_pr_table()).repartition(nblocks)
    got = {r["doc_id"]: r["pct_bp"]
           for r in _collect(grouped_percent_rank(ds, "lang", "n_chars"))}
    assert got == _pr_brute()
    # all-equal group ranks everyone at 0; singleton group too
    assert got[4] == got[5] == got[6] == 0 and got[7] == 0


@pytest.mark.parametrize("nblocks", [1, 5])
def test_gram_matrix_brute_force(ray_session, nblocks):
    """gram_matrix == numpy int64 brute force on the 2^10 lattice,
    invariant to block count (per-block float64 partials merge
    exactly); upper triangle only."""
    import ray.data as rd

    from ollama_ocr_ray.functions.clustering import GRAM_SCALE, gram_matrix

    t = pa.table({"embedding": pa.array([list(map(float, r)) for r in MAT])})
    got = {(r["i"], r["j"]): r["g"]
           for r in _collect(gram_matrix(
               rd.from_arrow(t).repartition(nblocks)))}
    q = np.floor(MAT.astype(np.float64) * GRAM_SCALE + 0.5).astype(np.int64)
    g = q.T @ q
    iu, ju = np.triu_indices(DIM)
    exp = {(int(i), int(j)): int(g[i, j]) for i, j in zip(iu, ju)}
    assert got == exp


# --- exact-lattice Lloyd k-means ---------------------------------------------


@pytest.mark.parametrize("nblocks", [1, 5])
def test_kmeans_lattice_matches_reference(ray_session, nblocks):
    """Distributed kmeans_lattice == the independent single-process
    reference under the same pinned integer contract, invariant to
    block count: assignments, centroids, and per-iteration objectives
    all bit-equal."""
    import ray.data as rd

    from ollama_ocr_ray.functions.clustering import (
        kmeans_lattice,
        kmeans_lattice_reference,
    )

    ds = rd.from_arrow(_table()).repartition(nblocks)
    assign_ds, cmat, objs = kmeans_lattice(ds, k=3, iters=3)
    got = {r["vec_id"]: (r["cluster"], r["d2"])
           for r in _collect(assign_ds)}
    want, cref, objs_ref = kmeans_lattice_reference(
        VEC_IDS, MAT, k=3, iters=3
    )
    assert got == want
    assert np.array_equal(cmat, cref)
    assert objs == objs_ref


def test_kmeans_objective_monotone(ray_session):
    """Lloyd descent holds EXACTLY on the lattice: the update step's
    round-half-up integer mean is the per-coordinate minimizer of the
    separable quadratic over lattice points, so the objective never
    increases across iterations."""
    import ray.data as rd

    from ollama_ocr_ray.functions.clustering import kmeans_lattice

    _, _, objs = kmeans_lattice(rd.from_arrow(_table()), k=4, iters=5)
    assert all(a >= b for a, b in zip(objs, objs[1:]))
    assert all(o >= 0 for o in objs)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """A seed that captures no points (duplicate of a smaller-id seed:
    every tie resolves away from it) keeps its centroid verbatim
    through every iteration instead of collapsing to zero."""
    import ray.data as rd

    from ollama_ocr_ray.functions.clustering import (
        KMEANS_SCALE,
        kmeans_lattice,
    )

    mat = MAT.copy()
    # seeds are vec_ids 0,1,2 -> rows where VEC_IDS is smallest; make
    # seeds 0 and 2 identical AND a far outlier: every tie between the
    # co-located pair resolves to cluster 0, cluster 0's update keeps
    # the pair's own location (its only members ARE the pair), so
    # cluster 2 stays empty through every iteration
    i0 = list(VEC_IDS).index(0)
    i2 = list(VEC_IDS).index(2)
    mat[i0] = 50.0
    mat[i2] = mat[i0]
    t = pa.table(
        {
            "vec_id": pa.array(VEC_IDS),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float32())),
        }
    )
    assign_ds, cmat, _ = kmeans_lattice(rd.from_arrow(t), k=3, iters=3)
    rows = _collect(assign_ds)
    assert not any(r["cluster"] == 2 for r in rows)
    q2 = np.floor(mat[i2].astype(np.float64) * KMEANS_SCALE + 0.5)
    assert np.array_equal(cmat[2], q2.astype(np.int64))


# --- PCA projection -----------------------------------------------------------


@pytest.mark.parametrize("nblocks", [1, 5])
def test_pca_project_matches_reference(ray_session, nblocks):
    """Distributed pca_project == the single-process reference
    (brute-force exact scatter + shared principal_axes contract),
    invariant to block count."""
    import ray.data as rd

    from ollama_ocr_ray.functions.clustering import (
        pca_project,
        pca_project_reference,
    )

    ds = rd.from_arrow(_table()).repartition(nblocks)
    got = {r["vec_id"]: (r["pc0"], r["pc1"])
           for r in _collect(pca_project(ds, r=2))}
    assert got == pca_project_reference(VEC_IDS, MAT, r=2)


def test_pca_axes_sign_pinned_and_orthonormal(ray_session):
    """principal_axes output is unit-norm on the 2^20 lattice (within
    quantization), near-orthogonal, and the largest-|coordinate| entry
    of each axis is positive."""
    import ray.data as rd

    from ollama_ocr_ray.functions.clustering import (
        PCA_SCALE,
        principal_axes,
        scatter_stats,
    )

    n, s, g = scatter_stats(rd.from_arrow(_table()))
    axes = principal_axes(n, s, g, 3)
    f = axes.astype(np.float64) / PCA_SCALE
    norms = np.linalg.norm(f, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    assert abs(float(f[0] @ f[1])) < 1e-5
    for row in axes:
        assert row[int(np.argmax(np.abs(row)))] > 0
