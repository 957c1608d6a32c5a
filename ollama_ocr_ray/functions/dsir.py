"""Hashed n-gram importance weighting for data selection (DSIR-style,
exact-integer form).

The real-world operation: DSIR (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling") trains two hashed-n-gram
bag-of-words models — one on a small TARGET corpus (the distribution
you want more of), one on the RAW crawl — and keeps the raw documents
whose features look most target-like.  It is the standard cheap
domain-selection step before pretraining: no neural scorer, just two
bounded count tables and one streaming scan.

Exact-oracle form: the paper's per-feature weight is the float
log-likelihood ratio ``log p_t(f) - log p_r(f)`` (``ln`` is not
bit-reproducible across libm implementations), so this variant uses
the SMOOTHED INTEGER RATIO in basis points::

    w_f = ((t_f + 1) * 10000) // (r_f + 1)

which is monotone in ``p_t(f) / p_r(f)`` for fixed corpus totals, and
the document score is the exact integer sum of its feature
occurrences' weights (``avg_w_bp`` = score // n_feats normalizes away
document length).  Every quantity is BIGINT-exact, so the DuckDB
oracle hash-matches.

Scale design (beyond-reference; no analog in the OCR scripts):

- Features are lowercased word unigrams + adjacent bigrams folded into
  ``N_BUCKETS`` hash buckets (the paper's hashed generative model):
  the weight table is BOUNDED at B entries by construction, at any
  corpus size.
- Pass 1 TRAINS: per-block partial bucket histograms (<= B rows per
  block enter the exchange — never token- or corpus-sized), a
  ~B-group groupby-sum (far below the measured ~50k groupby/sort
  crossover, BASELINE.md r4), and a B-row driver collect that is
  broadcast to the score tasks by closure capture (small-side
  pattern).
- Pass 2 SCORES in ONE streaming scan: per block, hash the UNIQUE
  features once (``text._token_hash_vec`` — the same cache-chunked
  Horner kernel the SimHash/fingerprint paths use, and the same hash
  chain the SQL oracle re-derives in HUGEINT), fold occurrences per
  doc with ``np.bincount``.  No exchange; text never leaves the
  block.
- Selection is top-k on ``(avg_w_bp DESC, doc_id)`` via
  ``selection.cap_per_group`` (per-block partial top-k bounds the
  exchange to k x blocks rows; the segment fold is exact under
  equal-key block splits).

The weight sums fit float64's exact-integer range (weights <= 1e4,
per-doc occurrences bounded by document length; sums << 2^53), so the
``np.bincount(weights=...)`` fold is exact before the int64 cast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _token_hash_vec

N_BUCKETS = 8192
W_SCALE = 10_000

DSIR_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_feats", pa.int64()),
        ("dsir_score", pa.int64()),
        ("avg_w_bp", pa.int64()),
    ]
)


def _doc_features(batch: pa.Table):
    """Per-document hashed-model features: lowercased whitespace-token
    unigrams plus adjacent bigrams (empties removed BEFORE pairing,
    matching the oracle's ``list_filter(string_split_regex(lower(..)))``
    order).  Returns (feature_strings, doc_row_indices) flat arrays."""
    toks = pc.utf8_split_whitespace(pc.utf8_lower(batch.column("text")))
    flat = pc.list_flatten(toks).combine_chunks() if isinstance(
        pc.list_flatten(toks), pa.ChunkedArray
    ) else pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "")
    flat = pc.filter(flat, mask)
    parents = parents[mask.to_numpy(zero_copy_only=False)]
    feats = [flat]
    fpar = [parents]
    if len(parents) >= 2:
        adj = parents[1:] == parents[:-1]
        sel = pa.array(adj)
        w1 = flat.slice(0, len(flat) - 1).filter(sel)
        w2 = flat.slice(1).filter(sel)
        feats.append(pc.binary_join_element_wise(w1, w2, " "))
        fpar.append(parents[:-1][adj])
    arrs = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            for a in feats]
    return pa.concat_arrays(arrs), np.concatenate(fpar)


def _bucket_ids(feats: pa.Array) -> np.ndarray:
    """Feature strings -> int64 bucket ids in [0, N_BUCKETS): the
    shared 60-bit token-hash chain mod B.  Hashes each UNIQUE feature
    once (vocabulary repeats make uniques far fewer than positions)."""
    if len(feats) == 0:
        return np.empty(0, dtype=np.int64)
    uniq = pc.unique(feats)
    h = _token_hash_vec(uniq.to_pylist())
    ub = (h % np.uint64(N_BUCKETS)).astype(np.int64)
    inv = pc.index_in(feats, value_set=uniq).to_numpy(zero_copy_only=False)
    return ub[inv]


_COUNT_SCHEMA = pa.schema(
    [("bucket", pa.int64()), ("n_all", pa.int64()), ("n_tgt", pa.int64())]
)


def dsir_count_partial(batch: pa.Table, *, target_col: str,
                       target_value: str) -> pa.Table:
    """Per-block partial bucket histograms: (bucket, n_all, n_tgt),
    nonzero rows only — at most ``N_BUCKETS`` rows enter the exchange
    per block regardless of block size."""
    batch = batch.combine_chunks()
    feats, parents = _doc_features(batch)
    if len(feats) == 0:
        return _COUNT_SCHEMA.empty_table()
    b = _bucket_ids(feats)
    n_all = np.bincount(b, minlength=N_BUCKETS)
    tgt_doc = pc.equal(
        batch.column(target_col), target_value
    ).to_numpy(zero_copy_only=False)
    tgt_doc = np.asarray(tgt_doc, dtype=bool)
    tmask = tgt_doc[parents]
    n_tgt = np.bincount(b[tmask], minlength=N_BUCKETS)
    nz = n_all > 0
    return pa.table(
        {
            "bucket": pa.array(np.nonzero(nz)[0].astype(np.int64)),
            "n_all": pa.array(n_all[nz].astype(np.int64)),
            "n_tgt": pa.array(n_tgt[nz].astype(np.int64)),
        }
    ).cast(_COUNT_SCHEMA)


def train_dsir_weights(docs, *, target_col: str = "lang",
                       target_value: str = "en") -> np.ndarray:
    """Global bucket weights ``w_f = ((t_f+1) * W_SCALE) // (r_f+1)``
    as an int64 array of length ``N_BUCKETS``.  Unhit buckets carry
    the formula's (t=0, r=0) smoothed value ``W_SCALE`` — consistent
    smoothing for scoring a DIFFERENT corpus against these weights."""
    import functools

    from ray.data.aggregate import Sum

    rows = (
        docs.map_batches(
            functools.partial(dsir_count_partial, target_col=target_col,
                              target_value=target_value),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("bucket")
        .aggregate(Sum("n_all", alias_name="n_all"),
                   Sum("n_tgt", alias_name="n_tgt"))
        .take_all()
    )
    r = np.zeros(N_BUCKETS, dtype=np.int64)
    t = np.zeros(N_BUCKETS, dtype=np.int64)
    for row in rows:
        r[row["bucket"]] = row["n_all"]
        t[row["bucket"]] = row["n_tgt"]
    return ((t + 1) * W_SCALE) // (r + 1)


def dsir_scores(docs, *, target_col: str = "lang",
                target_value: str = "en", weights: np.ndarray = None):
    """(doc_id, n_feats, dsir_score, avg_w_bp) for every document:
    the exact-integer importance score against the hashed target/raw
    models.  Pass ``weights`` to score against a model trained on a
    different corpus (the cross-corpus selection case); by default the
    model is trained on ``docs`` itself."""
    if weights is None:
        weights = train_dsir_weights(docs, target_col=target_col,
                                     target_value=target_value)
    w = np.ascontiguousarray(weights, dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        n = len(batch)
        feats, parents = _doc_features(batch)
        n_feats = np.bincount(parents, minlength=n).astype(np.int64)
        if len(feats):
            b = _bucket_ids(feats)
            sc = np.rint(
                np.bincount(parents, weights=w[b].astype(np.float64),
                            minlength=n)
            ).astype(np.int64)
        else:
            sc = np.zeros(n, dtype=np.int64)
        avg = np.zeros(n, dtype=np.int64)
        nzd = n_feats > 0
        avg[nzd] = sc[nzd] // n_feats[nzd]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_feats": pa.array(n_feats),
                "dsir_score": pa.array(sc),
                "avg_w_bp": pa.array(avg),
            }
        ).cast(DSIR_SCHEMA)

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def dsir_select(docs, *, k: int, target_col: str = "lang",
                target_value: str = "en"):
    """Top-``k`` documents by ``(avg_w_bp DESC, doc_id ASC)`` — the
    deterministic form of the paper's importance-resampling draw.
    Returns the selected rows with ``DSIR_SCHEMA``."""
    from .selection import cap_per_group

    scored = dsir_scores(docs, target_col=target_col,
                         target_value=target_value)

    def add_const(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(len(batch), dtype=np.int32))
        )

    capped = cap_per_group(
        scored.map_batches(add_const, batch_format="pyarrow",
                           zero_copy_batch=True),
        group_col="g", order_cols=["avg_w_bp", "doc_id"],
        descending=[True, False], k=int(k),
    )
    return capped.drop_columns(["g"])
