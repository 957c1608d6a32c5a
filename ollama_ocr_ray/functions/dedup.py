"""Deduplication operators: exact, MinHash+LSH, SimHash banding.

Scale notes (the part that matters at 100 TB):
- exact dedup never shuffles raw text: a content hash is computed
  vectorized per batch, *partial* (hash → min doc_id, count) aggregates
  are emitted per batch, and only those partials go through the
  ``groupby`` exchange (pre-aggregation pattern).
- MinHash-LSH shuffles only (band_id, band_hash, doc_id, signature)
  rows — signatures are ~``num_perm×8`` bytes, not documents; candidate
  pairs are verified from signatures inside the band groups, so no
  second join over the corpus.
- SimHash banding shuffles 4×16-bit band keys per doc and verifies
  Hamming distance inside groups.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import SimHasher, hamming64

# --- exact dedup ------------------------------------------------------------


def _content_hash_batch(batch: pa.Table) -> pa.Table:
    """Partial aggregate: one row per distinct content hash per batch."""
    texts = batch.column("text").to_pylist()
    hashes = pa.array(
        [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
    )
    t = pa.table({"h": hashes, "doc_id": batch.column("doc_id")})
    return t.group_by("h").aggregate([("doc_id", "min"), ("doc_id", "count")])


def exact_dedup(docs):
    """documents Dataset → (doc_id, n_dups): representative (min doc_id)
    and multiplicity per distinct text."""
    from ray.data.aggregate import Min, Sum

    partials = docs.map_batches(_content_hash_batch, batch_format="pyarrow")
    agg = partials.groupby("h").aggregate(
        Min("doc_id_min", alias_name="doc_id"),
        Sum("doc_id_count", alias_name="n_dups"),
    )
    return agg.select_columns(["doc_id", "n_dups"])


# --- MinHash + LSH ----------------------------------------------------------
_MERSENNE = (1 << 61) - 1


class MinHashLSH:
    """Actor-pool stage: doc text → LSH band rows.

    __init__ draws the (a, b) hash-permutation parameters once per actor
    from a fixed seed (deterministic across actors); __call__ emits
    ``bands`` rows per doc: (band_id, band_hash, doc_id, sig).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 seed: int = 42):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def _shingle_set(self, text: str) -> set:
        toks = text.split()
        k = self.shingle_k
        if len(toks) < k:
            return {" ".join(toks)} if toks else {""}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    def _shingle_hashes(self, text: str) -> np.ndarray:
        shingles = self._shingle_set(text)
        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
                )
                for s in shingles
            ),
            dtype=np.uint64,
            count=len(shingles),
        )

    def signature(self, text: str) -> np.ndarray:
        sh = self._shingle_hashes(text)
        # (num_perm, n_shingles) universal hashing, min over shingles
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes, sigs = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = self.signature(text)
            for b in range(self.bands):
                band = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                bh = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(bh)
                sigs.append(sig.astype(np.int64).tobytes())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.string()),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )


def _band_pairs(group: pa.Table, threshold: float, num_perm: int) -> pa.Table:
    """Candidate pairs within one (band_id, band_hash) bucket, verified
    by estimated Jaccard from the full signatures carried in the rows."""
    ids = group.column("doc_id").to_pylist()
    sigs = [np.frombuffer(s, dtype=np.int64) for s in group.column("sig").to_pylist()]
    a_out, b_out, est_out = [], [], []
    for (i, j) in itertools.combinations(range(len(ids)), 2):
        if ids[i] == ids[j]:
            continue
        est = float(np.mean(sigs[i] == sigs[j]))
        if est >= threshold:
            a, b = sorted((ids[i], ids[j]))
            a_out.append(a)
            b_out.append(b)
            est_out.append(est)
    return pa.table(
        {
            "a_id": pa.array(a_out, type=pa.int64()),
            "b_id": pa.array(b_out, type=pa.int64()),
            "est_jaccard": pa.array(est_out, type=pa.float64()),
        }
    )


def minhash_dup_pairs(docs, *, threshold: float = 0.8, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3, concurrency=(1, 8)):
    """documents Dataset → near-duplicate pairs (a_id, b_id, est_jaccard).

    shingle → minhash → band → bucket groupby → verify-in-bucket; pairs
    found in several buckets are deduplicated with a final groupby.
    """
    from ray.data.aggregate import Max

    band_rows = docs.map_batches(
        MinHashLSH,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
    )
    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _band_pairs(g, threshold, num_perm), batch_format="pyarrow"
    )
    return (
        pairs.groupby(["a_id", "b_id"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    )


# --- n-gram Jaccard (verification kernel, shared by tests) ------------------


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t: str) -> set:
        toks = t.split()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# --- SimHash near-dup -------------------------------------------------------


def _simhash_band_rows(batch: pa.Table) -> pa.Table:
    """4 bands × 16 bits per doc; exact band match → candidate."""
    batch = batch.combine_chunks()
    sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(batch)
    doc = np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), 4)
    full = np.repeat(sh.view(np.int64), 4)
    band_id = np.tile(np.arange(4, dtype=np.int32), n)
    band_val = np.empty(4 * n, dtype=np.int64)
    for b in range(4):
        band_val[b::4] = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).view(
            np.int64
        )
    return pa.table(
        {
            "doc_id": pa.array(doc, type=pa.int64()),
            "band_id": pa.array(band_id),
            "band_val": pa.array(band_val),
            "simhash": pa.array(full),
        }
    )


def _simhash_pairs(group: pa.Table, max_hamming: int) -> pa.Table:
    ids = group.column("doc_id").to_pylist()
    hashes = group.column("simhash").to_pylist()
    a_out, b_out, d_out = [], [], []
    for i, j in itertools.combinations(range(len(ids)), 2):
        if ids[i] == ids[j]:
            continue
        d = hamming64(hashes[i], hashes[j])
        if d <= max_hamming:
            a, b = sorted((ids[i], ids[j]))
            a_out.append(a)
            b_out.append(b)
            d_out.append(d)
    return pa.table(
        {
            "a_id": pa.array(a_out, type=pa.int64()),
            "b_id": pa.array(b_out, type=pa.int64()),
            "hamming": pa.array(d_out, type=pa.int32()),
        }
    )


def simhash_dup_pairs(docs, *, max_hamming: int = 3, concurrency=(1, 8)):
    """documents Dataset → (a_id, b_id, hamming) pairs with SimHash
    Hamming distance ≤ max_hamming (banding guarantees recall for ≤ 3
    differing bits across 4 bands by pigeonhole)."""
    from ray.data.aggregate import Min

    hashed = docs.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=concurrency
    )
    bands = hashed.map_batches(_simhash_band_rows, batch_format="pyarrow")
    pairs = bands.groupby(["band_id", "band_val"]).map_groups(
        lambda g: _simhash_pairs(g, max_hamming), batch_format="pyarrow"
    )
    return pairs.groupby(["a_id", "b_id"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def ngram_dup_pairs(docs, *, k: int = 9, threshold: float = 0.5,
                    num_perm: int = 64, bands: int = 16,
                    concurrency=(1, 8)):
    """Near-dup pairs by EXACT character-k-gram Jaccard, with MinHash
    banding as the candidate generator: signature+text rows land in band
    buckets (groupby), candidate pairs inside a bucket are verified by
    exact shingle-set Jaccard, then pairs dedup across bands.

    ``k`` defaults to 9: short char shingles (k<=4) occur in nearly
    every document, so signatures collide corpus-wide and bucket verify
    degenerates quadratic (measured: 400+s vs ~5s at sf0.1).

    Scale note: text rides along into the band groups here (duplicated
    per band), which is right at test scale; the 100 TB path carries
    only (doc_id, signature) through the shuffle and re-joins text by
    doc_id hash for the verify stage.
    """
    import pyarrow.compute as pc

    rows_per_band = num_perm // bands

    def sig_rows(hasher, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_band, out_key, out_id, out_text = [], [], [], []
        for i, t in enumerate(texts):
            sig = hasher.signature(t)
            for b in range(bands):
                seg = sig[b * rows_per_band:(b + 1) * rows_per_band]
                key = hash((b,) + tuple(int(x) for x in seg)) & ((1 << 62) - 1)
                out_band.append(b)
                out_key.append(key)
                out_id.append(ids[i])
                out_text.append(t)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_key, type=pa.int64()),
                "doc_id": pa.array(out_id),
                "text": pa.array(out_text, type=pa.string()),
            }
        )

    class CharMinHash(MinHashLSH):
        """Character-k-gram shingles — the SAME shingle space the
        verify stage measures, so candidate recall matches the
        banding guarantee (word-shingle signatures would miss pairs
        whose char-Jaccard clears the threshold)."""

        def _shingle_set(self, text: str) -> set:
            return {text[i:i + k] for i in range(max(1, len(text) - k + 1))}

    class SigRows:
        def __init__(self):
            self._h = CharMinHash(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return sig_rows(self._h, batch)

    def shingles(t: str) -> set:
        return {t[i:i + k] for i in range(max(1, len(t) - k + 1))}

    def verify_group(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        ids = group.column("doc_id").to_pylist()
        texts = group.column("text").to_pylist()
        id_type = group.column("doc_id").type
        if len(ids) < 2:
            return pa.table(
                {"a_id": pa.array([], type=id_type),
                 "b_id": pa.array([], type=id_type),
                 "jaccard": pa.array([], type=pa.float64())}
            )
        sh = [shingles(t) for t in texts]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                inter = len(sh[i] & sh[j])
                union = len(sh[i] | sh[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(jac)
        return pa.table(
            {"a_id": pa.array(a_out, type=id_type),
             "b_id": pa.array(b_out, type=id_type),
             "jaccard": pa.array(j_out, type=pa.float64())}
        )

    pairs = (
        docs.map_batches(SigRows, batch_format="pyarrow",
                         concurrency=concurrency)
        .groupby(["band", "bucket"])
        .map_groups(verify_group, batch_format="pyarrow")
    )

    def dedup_pairs(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return pairs.groupby(["a_id", "b_id"]).map_groups(
        dedup_pairs, batch_format="pyarrow"
    )
