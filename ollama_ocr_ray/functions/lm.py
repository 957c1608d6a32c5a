"""Count-based bigram language-model scoring (CCNet-style quality
filter, exact-integer form).

The real-world operation: train a cheap LM on the corpus (CCNet uses a
KenLM 5-gram; Dolma/RedPajama use similar perplexity filters), then
score every document by how "familiar" its text is to that model —
low-familiarity documents are boilerplate, lorem-ipsum, encoding
garbage, or wrong-language text.

Scale design (same two-pass broadcast shape as ``text.tfidf_scores``):

- Pass 1 TRAINS the model: per-block partial bigram counts (pure Arrow
  ``group_by``; the exchange moves (bigram, partial-count) rows, never
  corpus-sized), a global sum, and a deterministic (count DESC, bigram
  ASC) cut to the top-``vocab_size`` bigrams.  The model is BOUNDED by
  construction, so collecting it driver-side and shipping it to every
  score task is the broadcast-small-side pattern at any corpus size
  (``ray.put`` happens implicitly via closure capture, once per task).
- Pass 2 SCORES in one streaming scan: vectorized membership of each
  document's bigrams against the model (Arrow ``is_in`` hash lookup).

Exact-oracle form: instead of float log-probs (whose ``ln`` is not
bit-reproducible across libm implementations), the score is the pure
integer *model coverage* — how many of the document's bigrams the
trained model contains — and basis points thereof via INTEGER
division, so the DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LM_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bigrams", pa.int64()),
        ("n_seen", pa.int64()),
        ("familiarity_bp", pa.int64()),
    ]
)


def _doc_bigrams(batch: pa.Table):
    """Per-document adjacent-token bigrams (lowercased whitespace
    tokens, empties removed BEFORE pairing — matching the oracle's
    ``list_filter(regexp_split_to_array(lower(text)))`` order).
    Returns (bigram_strings, doc_row_indices) flat arrays."""
    toks = pc.utf8_split_whitespace(pc.utf8_lower(batch.column("text")))
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(flat, "")
    flat = pc.filter(flat, mask)
    parents = parents[mask.to_numpy(zero_copy_only=False)]
    if len(parents) < 2:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    adj = parents[1:] == parents[:-1]
    w1 = flat.slice(0, len(flat) - 1).filter(pa.array(adj))
    w2 = flat.slice(1).filter(pa.array(adj))
    grams = pc.binary_join_element_wise(w1, w2, " ")
    return grams, parents[:-1][adj]


def bigram_count_partial(batch: pa.Table) -> pa.Table:
    """Per-block partial bigram counts: (bigram, n)."""
    batch = batch.combine_chunks()
    grams, _ = _doc_bigrams(batch)
    agg = pa.table({"bigram": grams}).group_by("bigram").aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {"bigram": agg.column("bigram"),
         "n": agg.column("count_all").cast(pa.int64())}
    )


def train_bigram_lm(docs, *, vocab_size: int = 4096) -> pa.Array:
    """Top-``vocab_size`` corpus bigrams by (count DESC, bigram ASC) —
    the trained "model", returned as an Arrow string array ready for
    ``pc.is_in`` membership tests."""
    from ray.data.aggregate import Sum

    rows = (
        docs.map_batches(bigram_count_partial, batch_format="pyarrow")
        .groupby("bigram").aggregate(Sum("n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(vocab_size)
        .take_all()
    )
    return pa.array([r["bigram"] for r in rows], type=pa.string())


def lm_familiarity(docs, *, vocab_size: int = 4096,
                   keep_cols: tuple = ()):
    """(doc_id, n_bigrams, n_seen, familiarity_bp[, keep_cols...]):
    per-document coverage by the corpus-trained top-``vocab_size``
    bigram model.  ``familiarity_bp = (10000 * n_seen) // n_bigrams``
    (0 when the document has no bigram)."""
    model = train_bigram_lm(docs, vocab_size=vocab_size)

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        grams, parents = _doc_bigrams(batch)
        n = len(batch)
        total = np.bincount(parents, minlength=n).astype(np.int64)
        if len(grams) and len(model):
            seen_mask = pc.is_in(grams, value_set=model).to_numpy(
                zero_copy_only=False
            )
            seen = np.bincount(
                parents[seen_mask], minlength=n
            ).astype(np.int64)
        else:
            seen = np.zeros(n, dtype=np.int64)
        bp = np.zeros(n, dtype=np.int64)
        nz = total > 0
        bp[nz] = (10_000 * seen[nz]) // total[nz]
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array(total),
                "n_seen": pa.array(seen),
                "familiarity_bp": pa.array(bp),
            }
        ).cast(LM_SCHEMA)
        for c in keep_cols:
            out = out.append_column(c, batch.column(c))
        return out

    return docs.map_batches(score, batch_format="pyarrow")


def ccnet_buckets(docs, *, vocab_size: int = 4096):
    """(doc_id, lang, familiarity_bp, pct_bp, bucket): CCNet-style
    head/middle/tail quality bucketing (Wenzek et al. 2020 route
    documents by per-language perplexity tertiles; here the quality
    signal is the repo's exact bigram-LM coverage, higher = better).
    ``pct_bp`` is the EXACT per-lang percent rank (strictly-below *
    10000 // group size) and the buckets are pinned integer tertiles:
    head >= 6667 bp, middle >= 3333 bp, else tail.

    Plan: the LM's two passes (bounded-broadcast train + streaming
    score with ``lang`` carried through), ONE (lang x distinct-score)
    histogram exchange (``sketches.grouped_percent_rank`` — no sort),
    then an exchange-free label pass.  At 100 TB the histogram is
    |langs| x 10001 rows at most (familiarity_bp is bounded discrete
    by construction)."""
    from .sketches import grouped_percent_rank

    scored = lm_familiarity(docs, vocab_size=vocab_size,
                            keep_cols=("lang",))
    ranked = grouped_percent_rank(
        scored.select_columns(["doc_id", "lang", "familiarity_bp"]),
        "lang", "familiarity_bp")

    def label(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        bp = batch.column("pct_bp").to_numpy(zero_copy_only=False)
        bucket = np.where(
            bp >= 6667, "head", np.where(bp >= 3333, "middle", "tail"))
        return batch.append_column(
            "bucket", pa.array(bucket, type=pa.string()))

    return ranked.map_batches(label, batch_format="pyarrow",
                              zero_copy_batch=True)
