"""Exact-integer-lattice linear quality classifier.

The GPT-3/CCNet-style "quality classifier" stage — a linear model over
cheap per-doc signals, trained full-batch on the corpus and applied as
a streaming filter — built on the same pinned-integer discipline as
``clustering.kmeans_lattice`` so training is BIT-reproducible under
any partitioning AND expressible as an unrolled DuckDB recurrence
(the `pagerank` oracle pattern), giving the trainer a full SQL oracle
instead of a reference-only gate.

Model/contract (every constant is part of it; the oracle repeats it):

- features per doc (int64): f0 = 1 (bias), f1 = n_tokens (whitespace
  tokens, empties dropped), f2 = n_stop (STOPWORDS members), f3 =
  n_chars; label y = 1 iff lang == 'en';
- score_i  = tdiv(w0 + w1*f1 + w2*f2 + w3*f3, 1000)   [basis points]
- pred_i   = clamp(5000 + score_i, 0, 10000)          [hard sigmoid]
- err_i    = pred_i - 10000 * y_i
- g_j      = sum_i err_i * f_ij          (exact int64; order-free)
- w_j     -= tdiv(g_j, n * 200)          (full-batch GD step)

``tdiv`` is TRUNCATING division (toward zero): DuckDB's ``//``
truncates while Python/numpy floor — a negative gradient would
silently diverge between engine and oracle under floor semantics, so
the truncating form is pinned on both sides.

The hard sigmoid (a clamped line) replaces exp's transcendental
rounding: every step stays on the integer lattice, so block-order
never enters.  Distributed shape: featurize once (streaming map,
materialized); each GD iteration is ONE streaming pass emitting a
single 5-int partial row per block (the ``scatter_stats`` shape);
scoring is one exchange-free pass.  Nothing corpus-sized touches the
driver.

Overflow contract: |err| <= 10^4 and features are per-doc counts, so
per-block partials are ~1e11 at 25k-row blocks and the global sum
stays inside int64 up to ~1e14 total feature mass; the update guard
raises loudly past it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import STOPWORDS, _segment_count

SCORE_DIV = 1000
LR_DEN = 200  # tuned: unnormalized count features oscillate at <~100
P_SCALE = 10000
_G_GUARD = (2 ** 63 - 1) // 4


def _tdiv_vec(a: np.ndarray, b) -> np.ndarray:
    """Truncating integer division (DuckDB `//`), b > 0."""
    q = np.abs(a) // b
    return np.where(np.asarray(a) < 0, -q, q).astype(np.int64)


def _tdiv_int(a: int, b: int) -> int:
    return -((-a) // b) if a < 0 else a // b


def featurize_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text, lang) -> (doc_id, f1, f2, f3, y) int64."""
    batch = batch.combine_chunks()
    text = batch.column("text")
    toks = pc.utf8_split_whitespace(text)
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    f1 = _segment_count(toks, nonempty, len(batch)).astype(np.int64)
    stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False)
    f2 = _segment_count(toks, stop, len(batch)).astype(np.int64)
    f3 = pc.utf8_length(text).cast(pa.int64())
    y = pc.cast(pc.equal(batch.column("lang"), "en"), pa.int64())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "f1": pa.array(f1),
        "f2": pa.array(f2),
        "f3": pa.array(f3),
        "y": y,
    })


def _pred_bp(feats: pa.Table, w: list) -> np.ndarray:
    f1 = feats.column("f1").to_numpy(zero_copy_only=False)
    f2 = feats.column("f2").to_numpy(zero_copy_only=False)
    f3 = feats.column("f3").to_numpy(zero_copy_only=False)
    raw = w[0] + w[1] * f1 + w[2] * f2 + w[3] * f3
    score = _tdiv_vec(raw, SCORE_DIV)
    return np.clip(5000 + score, 0, P_SCALE).astype(np.int64)


def train_linear(feats, *, iters: int = 3) -> list:
    """Full-batch GD on the pinned integer lattice (module doc).
    ``feats`` is a featurized Dataset; one streaming pass per
    iteration, one 5-int row per block to the driver."""
    w = [0, 0, 0, 0]

    def grad_partial(batch: pa.Table, _w: tuple) -> pa.Table:
        schema = pa.schema([("g0", pa.int64()), ("g1", pa.int64()),
                            ("g2", pa.int64()), ("g3", pa.int64()),
                            ("n", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        batch = batch.combine_chunks()
        pred = _pred_bp(batch, list(_w))
        err = pred - P_SCALE * batch.column("y").to_numpy(
            zero_copy_only=False)
        f1 = batch.column("f1").to_numpy(zero_copy_only=False)
        f2 = batch.column("f2").to_numpy(zero_copy_only=False)
        f3 = batch.column("f3").to_numpy(zero_copy_only=False)
        return pa.table({
            "g0": pa.array([int(err.sum())], type=pa.int64()),
            "g1": pa.array([int((err * f1).sum())], type=pa.int64()),
            "g2": pa.array([int((err * f2).sum())], type=pa.int64()),
            "g3": pa.array([int((err * f3).sum())], type=pa.int64()),
            "n": pa.array([batch.num_rows], type=pa.int64()),
        })

    for _ in range(iters):
        wt = tuple(w)
        g = [0, 0, 0, 0]
        n = 0
        for row in feats.map_batches(
            lambda b, _w=wt: grad_partial(b, _w),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all():
            for j in range(4):
                g[j] += row[f"g{j}"]
            n += row["n"]
        if n == 0:
            break
        if max(abs(x) for x in g) > _G_GUARD:
            raise RuntimeError(
                "train_linear: gradient exceeds the int64 guard; "
                "normalize features (overflow contract in module doc)"
            )
        w = [w[j] - _tdiv_int(g[j], n * LR_DEN) for j in range(4)]
    return w


def score_linear(feats, w: list):
    """Exchange-free scoring pass: (doc_id, pred_bp, label)."""
    wt = tuple(w)

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pred_bp": pa.array(_pred_bp(batch, list(wt))),
            "label": batch.column("y"),
        })

    return feats.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True)


def train_linear_reference(f1, f2, f3, y, *, iters: int = 3) -> list:
    """Independent single-process comparator (plain Python loops)."""
    w = [0, 0, 0, 0]
    n = len(y)
    for _ in range(iters):
        g = [0, 0, 0, 0]
        for i in range(n):
            raw = w[0] + w[1] * f1[i] + w[2] * f2[i] + w[3] * f3[i]
            s = _tdiv_int(raw, SCORE_DIV)
            pred = min(max(5000 + s, 0), P_SCALE)
            e = pred - P_SCALE * y[i]
            g[0] += e
            g[1] += e * f1[i]
            g[2] += e * f2[i]
            g[3] += e * f3[i]
        if n == 0:
            break
        w = [w[j] - _tdiv_int(g[j], n * LR_DEN) for j in range(4)]
    return w
