"""Distributed BPE tokenizer: histogram-train + streaming encode.

Sennrich et al. 2015 byte-pair encoding, built the way production
trainers (SentencePiece, HF tokenizers) actually build it: BPE
training never touches the raw corpus after ONE counting pass — it
operates on the WORD-TYPE histogram, whose size grows sublinearly
(Heaps' law) and is capped loudly here.  The split of labor:

- ``word_histogram``: the only corpus-sized work — per-block partial
  counts (one row per distinct in-block word) into one bounded
  vocabulary exchange; driver-materialized under ``cap``.
- ``train_bpe``: pure driver function over word types, O(types x
  merges x len); corpus size is out of the picture.
- ``encode_batch``/the encode pass: exchange-free streaming map; the
  merge table ships once per task (it is tiny), each task encodes
  every DISTINCT word in its block once through a per-task cache and
  gathers per-doc token counts + an order-sensitive token-sequence
  digest (mod-2^61-1 Horner over vectorized token hashes — scalar
  columns, selfcheck-sortable).

Pinned tokenizer contract (both the engine and the independent
reference in this module implement it; tie-breaks are part of it):
  * pre-tokenization: lowercase, whitespace-split, empty tokens
    dropped; merges never cross word boundaries;
  * initial symbols: the word's unicode characters (no end-of-word
    marker);
  * training step: merge the pair with the highest total count over
    types (weighted by word frequency); ties break to the
    lexicographically smallest (a, b); occurrences merge
    left-to-right, non-overlapping;
  * encoding: repeatedly apply the PRESENT pair with the lowest merge
    rank, left-to-right non-overlapping, until none applies.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WORD_CAP = 4_000_000


def word_histogram(docs, *, text_col: str = "text",
                   cap: int = WORD_CAP) -> dict:
    """Corpus word-frequency table (lowercase whitespace tokens) as a
    driver dict — the trainer's input.  Per-block partials bound the
    exchange to distinct-in-block words; the driver materialization is
    capped loudly (a vocabulary that big needs a bigger trainer box,
    not a silent truncation)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        flat = pc.list_flatten(
            pc.utf8_split_whitespace(pc.utf8_lower(batch.column(text_col)))
        )
        arr = flat.to_numpy(zero_copy_only=False)
        arr = arr[arr != ""]
        uniq, cnt = np.unique(arr, return_counts=True)
        return pa.table({
            "word": pa.array(uniq.astype(object)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    agg = docs.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
              .groupby("word").aggregate(Sum("n", alias_name="n"))
    rows = agg.limit(cap + 1).take_all()
    if len(rows) > cap:
        raise RuntimeError(
            f"word_histogram: > {cap} word types; raise `cap` on a "
            "bigger trainer, or pre-filter the corpus"
        )
    return {r["word"]: r["n"] for r in rows}


def _merge_syms(syms: tuple, a: str, b: str) -> tuple:
    """Left-to-right non-overlapping merge of (a, b) -> a+b."""
    out = []
    i = 0
    ab = a + b
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(hist: dict, *, num_merges: int = 200) -> list:
    """Merge table from a word histogram (contract in the module doc).
    Pure function of the histogram — partitioning never enters."""
    types = {w: tuple(w) for w in hist if w}
    merges: list = []
    for _ in range(num_merges):
        pair_counts: dict = {}
        for w, syms in types.items():
            n = hist[w]
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        a, b = min(p for p, n in pair_counts.items() if n == best_n)
        merges.append((a, b))
        types = {
            w: _merge_syms(syms, a, b) if a in syms else syms
            for w, syms in types.items()
        }
    return merges


def encode_word(word: str, ranks: dict) -> tuple:
    """Encode one word with a trained merge-rank table (contract in
    the module doc)."""
    syms = tuple(word)
    while len(syms) > 1:
        best = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        syms = _merge_syms(syms, *best[1])
    return syms


def encode_batch(batch: pa.Table, *, ranks: dict,
                 cache: dict) -> pa.Table:
    """Per-block encode: distinct words encode once through ``cache``
    (Zipf makes hits dominate), token sequences digest via the shared
    Horner kernel.  Emits (doc_id, n_bpe_tok, tok_digest)."""
    from .text import _polyhash_segments, _token_hash_vec

    batch = batch.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(batch.column("text")))
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = flat != ""
    flat, parents = flat[keep], parents[keep]

    all_tokens: list = []
    lengths = np.zeros(batch.num_rows, dtype=np.int64)
    # words stream in doc order, so parents stay non-decreasing and the
    # per-doc token runs concatenate in order
    for w, p in zip(flat.tolist(), parents.tolist()):
        enc = cache.get(w)
        if enc is None:
            enc = encode_word(w, ranks)
            cache[w] = enc
        all_tokens.extend(enc)
        lengths[p] += len(enc)
    th = _token_hash_vec(all_tokens)
    digests = _polyhash_segments(th.astype(np.uint64), lengths)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe_tok": pa.array(lengths),
        "tok_digest": pa.array(digests.view(np.int64)),
    })


def bpe_encode(docs, *, merges: list):
    """Exchange-free streaming encode of a documents Dataset with a
    trained merge table."""
    ranks = {p: i for i, p in enumerate(merges)}

    def fn(batch: pa.Table, _cache: dict = {}) -> pa.Table:
        return encode_batch(batch, ranks=ranks, cache=_cache)

    return docs.map_batches(fn, batch_format="pyarrow",
                            zero_copy_batch=True)


# --- independent single-process reference (gate comparator) -----------------


def bpe_reference(texts: list, *, num_merges: int = 200):
    """Deliberately separate implementation of the pinned contract:
    raw-corpus counting (no histogram partials), list-of-list symbol
    state, per-doc encode without caching.  Returns (merges,
    {doc_index: [token, ...]})."""
    words_per_doc = [
        [w for w in t.lower().split() if w] for t in texts
    ]
    counts: dict = {}
    for ws in words_per_doc:
        for w in ws:
            counts[w] = counts.get(w, 0) + 1

    state = {w: list(w) for w in counts}
    merges = []
    for _ in range(num_merges):
        pc_: dict = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] = \
                    pc_.get((syms[i], syms[i + 1]), 0) + counts[w]
        if not pc_:
            break
        top = max(pc_.values())
        pair = min(p for p in pc_ if pc_[p] == top)
        merges.append(pair)
        for w in state:
            syms = state[w]
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == pair[0]
                        and syms[i + 1] == pair[1]):
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out

    ranks = {p: i for i, p in enumerate(merges)}
    encoded = {}
    for di, ws in enumerate(words_per_doc):
        toks: list = []
        for w in ws:
            syms = list(w)
            while len(syms) > 1:
                cand = [(ranks[(syms[i], syms[i + 1])], i)
                        for i in range(len(syms) - 1)
                        if (syms[i], syms[i + 1]) in ranks]
                if not cand:
                    break
                r, _ = min(cand)
                a, b = merges[r]
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            toks.extend(syms)
        encoded[di] = toks
    return merges, encoded
