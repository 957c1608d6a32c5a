"""Sharded shared fingerprint index for INCREMENTAL exact dedup.

The batch exact-dedup path (``functions/dedup.exact_dedup``) is an
exchange: every (hash, doc_id) row shuffles once — the right plan when
the whole corpus is in front of you.  The incremental case is
different: a daily ingest of new shards must dedup against EVERYTHING
already exported, and re-shuffling 100 TB of history per day is wrong.
The scale answer is a persistent index keyed by content hash — the one
semantics the Dataset API genuinely can't express (a shared MUTABLE
lookup across independent tasks), so this module drops to raw Ray
actors, per the documented escape-hatch policy.

Design:

- ``IndexShard`` actors (``num_cpus=0`` — memory services, not
  compute) each own ``hash -> (min_doc_id, count)`` for their slice of
  the hash space.  Routing is the digest's first 8 bytes mod
  ``n_shards`` — deterministic, so a hash always lands on one shard
  and no cross-shard coordination exists.  On a real cluster shards
  spread across nodes; memory is ~50 B per distinct document, the
  honest price of never re-reading history.
- Ingest is TWO-PHASE so the result is deterministic (global min
  doc_id wins) rather than arrival-order racy: phase 1 streams
  ``offer`` batches into the shards (each map task blocks on its
  actor acks, and the pass is materialized as a barrier); phase 2
  streams ``lookup`` batches and keeps exactly the rows whose id IS
  the registered winner.
- ``seal()`` freezes the current winners: a later corpus's offers
  cannot displace a sealed entry even with a smaller doc_id — the
  incremental contract (history is already exported; new dups of old
  content must DROP, not steal the crown).

Reference parity note: the reference has no incremental story at all
(one process, one file at a time — ocr_router.py main loop); this is
part of the beyond-reference training-data suite.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class IndexShard:
    """One hash-space slice: ``digest -> (min_doc_id, offer_count)``.

    Methods take parallel lists (one actor call per batch per shard,
    never per row).  State splits into ``_sealed`` (winners frozen by
    ``seal()``) and ``_open`` (the current ingest's candidates)."""

    def __init__(self):
        self._sealed: dict = {}
        self._open: dict = {}
        self._seen_keys: set = set()

    def offer(self, key: int, digests: list, ids: list) -> int:
        """``key`` is an idempotency token (the batch slice's min
        doc_id — unique because batches partition the id space): a
        replayed offer (Ray task retry, or a rerun of the same ingest
        against an unsealed index) is a no-op, so multiplicities stay
        exact under retries."""
        if key in self._seen_keys:
            return len(self._open)
        self._seen_keys.add(key)
        sealed, open_ = self._sealed, self._open
        for h, i in zip(digests, ids):
            if h in sealed:
                ent = sealed[h]
                sealed[h] = (ent[0], ent[1] + 1)
                continue
            ent = open_.get(h)
            if ent is None:
                open_[h] = (i, 1)
            else:
                open_[h] = (min(ent[0], i), ent[1] + 1)
        return len(open_)

    def lookup(self, digests: list) -> list:
        sealed, open_ = self._sealed, self._open
        out = []
        for h in digests:
            ent = sealed.get(h) or open_.get(h)
            out.append((-1, 0) if ent is None else ent)
        return out

    def seal(self) -> int:
        self._sealed.update(self._open)
        self._open = {}
        self._seen_keys = set()  # next ingest is a fresh epoch
        return len(self._sealed)

    def size(self) -> tuple:
        return (len(self._sealed), len(self._open))

    def dump_sealed(self, path: str) -> int:
        """Persist the SEALED entries as one parquet file (digest,
        min_doc_id, count) — each shard writes its own slice, so the
        save is shard-parallel and never funnels the index through
        the driver.  Open (unsealed) entries are deliberately not
        saved: an unfinished ingest resumes by re-running it (the
        offers are idempotent), not by restoring half its state."""
        import pyarrow.parquet as pq

        items = list(self._sealed.items())
        # ids may MIX int and string across epochs (a parquet epoch
        # followed by a JSONL crawl epoch) — store (str, kind) so the
        # exact Python objects round-trip; equality semantics across
        # differently-typed epochs stay correct (a sealed int winner
        # never equals a new str id, so new copies of old content
        # drop — the intended contract)
        t = pa.table(
            {
                "digest": pa.array([h for h, _ in items],
                                   type=pa.binary()),
                "doc_id": pa.array([str(e[0]) for _, e in items],
                                   type=pa.string()),
                "id_kind": pa.array(
                    ["i" if isinstance(e[0], (int, np.integer)) else "s"
                     for _, e in items],
                    type=pa.string(),
                ),
                "count": pa.array([e[1] for _, e in items],
                                  type=pa.int64()),
            }
        )
        pq.write_table(t, path)
        return t.num_rows

    def load_sealed(self, path: str) -> int:
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        self._sealed = {
            h: (int(i) if k == "i" else i, c)
            for h, i, k, c in zip(t.column("digest").to_pylist(),
                                  t.column("doc_id").to_pylist(),
                                  t.column("id_kind").to_pylist(),
                                  t.column("count").to_pylist())
        }
        return len(self._sealed)


class DedupIndex:
    """Driver-side handle over ``n_shards`` IndexShard actors; the
    handle (actor refs + shard count) pickles into map tasks.

    ``save``/``load`` give the index a life beyond one Ray session —
    the incremental contract is cross-JOB (yesterday's export, today's
    ingest), so the sealed winners persist as per-shard parquet under
    a directory whose shard count is pinned in ``index.json`` (the
    digest→shard routing depends on n_shards, so a reload must use
    the same fan-out).  Shards write/read the snapshot directly, so
    the path must be shared storage on a multi-node cluster (NFS/S3
    mount — the same requirement ``state/runner.py`` documents for
    its checkpoint dirs)."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [IndexShard.remote() for _ in range(n_shards)]

    def seal(self) -> int:
        return sum(ray.get([s.seal.remote() for s in self.shards]))

    def sizes(self) -> list:
        return ray.get([s.size.remote() for s in self.shards])

    def save(self, path: str) -> int:
        """Seal, then persist every shard (parallel, atomic via the
        shared ``_atomic_snapshot_save`` scaffolding)."""
        import os

        self.seal()

        def dump(tmp):
            return sum(ray.get([
                s.dump_sealed.remote(
                    os.path.join(tmp, f"shard-{i}.parquet"))
                for i, s in enumerate(self.shards)
            ]))

        return _atomic_snapshot_save(
            path, {"n_shards": self.n_shards, "kind": "exact"}, dump
        )

    @classmethod
    def load(cls, path: str) -> "DedupIndex":
        import os

        meta = _load_snapshot_meta(path, "exact")
        index = cls(n_shards=meta["n_shards"])
        ray.get([
            s.load_sealed.remote(os.path.join(path, f"shard-{i}.parquet"))
            for i, s in enumerate(index.shards)
        ])
        return index


def _digest_route(batch: pa.Table, n_shards: int):
    """(digests, ids, shard_of) for one batch.  Content identity:
    sha256 of the ``text`` column when present (the exact_dedup
    contract), else of a canonical serialization of the interleaved
    ``spans`` column (kind/text/media_ref/offset per span, length-
    prefixed so no two span lists collide by concatenation) — the
    shape the CLI ingest job sees.  Ids may be int64 or string; the
    index only needs equality + a stable min."""
    names = set(batch.schema.names)
    if "text" in names:
        contents = [t.encode("utf-8")
                    for t in batch.column("text").to_pylist()]
    elif "spans" in names:
        contents = []
        for spans in batch.column("spans").to_pylist():
            parts = []
            for s in spans or []:
                for field in ("kind", "text", "media_ref"):
                    v = s.get(field) or ""
                    parts.append(f"{len(v)}:{v}")
                parts.append(f"o{s.get('offset')}")
            contents.append("|".join(parts).encode("utf-8"))
    else:
        raise ValueError(
            "dedup_index: batch has neither 'text' nor 'spans'; "
            f"columns: {sorted(names)}"
        )
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    digests = [hashlib.sha256(c).digest() for c in contents]
    shard_of = np.array(
        [int.from_bytes(d[:8], "big") % n_shards for d in digests],
        dtype=np.int64,
    )
    return digests, ids, shard_of


def ingest_dedup(docs, index: DedupIndex, *, keep_cols=("doc_id",),
                 stats: dict | None = None):
    """Two-phase incremental exact dedup of ``docs`` against (and
    into) ``index``: returns the surviving rows plus ``n_dups`` (this
    ingest's multiplicity folded onto the winner; for content sealed
    in a previous ingest, nobody survives here — those dups counted
    against history are dropped entirely).

    Phase 1 (offer) is materialized as a barrier; phase 2 (lookup +
    filter) streams.  Output is deterministic: the winner is the
    global min doc_id among this ingest's copies, never a race.
    Pass ``stats`` to receive ``n_input`` from the barrier's per-batch
    counts — callers then don't pay a separate counting scan.
    """
    shards, n = index.shards, index.n_shards

    def offer(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([0], type=pa.int64())})
        digests, ids, shard_of = _digest_route(batch, n)
        key = ids.min()  # idempotency token: batches partition the
        # id space, so the slice minimum is unique per batch
        key = key.item() if hasattr(key, "item") else key
        refs = []
        for s in np.unique(shard_of):
            m = shard_of == s
            refs.append(shards[int(s)].offer.remote(
                key,
                [d for d, hit in zip(digests, m) if hit],
                ids[m].tolist(),
            ))
        ray.get(refs)  # ack before the barrier counts this block done
        return pa.table({"n": pa.array([batch.num_rows],
                                       type=pa.int64())})

    counts = docs.map_batches(offer, batch_format="pyarrow").materialize()
    if stats is not None:
        # one row per batch — bounded by block count, not corpus size
        stats["n_input"] = sum(r["n"] for r in counts.take_all())

    cols = list(keep_cols)

    def keep_winners(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        out_schema = pa.schema(
            [(c, batch.schema.field(c).type) for c in cols]
            + [("n_dups", pa.int64())]
        )
        if batch.num_rows == 0:
            return out_schema.empty_table()
        digests, ids, shard_of = _digest_route(batch, n)
        win = np.empty(len(ids), dtype=object)  # ids may be str or int
        cnt = np.zeros(len(ids), dtype=np.int64)
        refs, masks = [], []
        for s in np.unique(shard_of):
            m = shard_of == s
            masks.append(m)
            refs.append(shards[int(s)].lookup.remote(
                [d for d, hit in zip(digests, m) if hit]
            ))
        for m, res in zip(masks, ray.get(refs)):
            win[m] = np.array([r[0] for r in res], dtype=object)
            cnt[m] = np.array([r[1] for r in res], dtype=np.int64)
        sel = pa.array((win == ids).astype(bool))
        kept = batch.filter(sel).select(cols)
        return kept.append_column(
            "n_dups", pa.array(cnt[win == ids], type=pa.int64())
        )

    return docs.map_batches(keep_winners, batch_format="pyarrow")


# --- incremental NEAR-dup: LSH signature index ------------------------------
#
# The exact index above answers "have I exported this exact content?".
# Real crawls re-ingest boilerplate-mutated copies, so the incremental
# question is fuzzy: "is this a near-duplicate of anything in history?".
# Same actor-shard shape, but entries are MinHash signatures routed by
# LSH band bucket: a new document probes its ``bands`` buckets, and
# candidates are verified by the signature-equality Jaccard estimate
# (mean over num_perm permutations — the standard unbiased estimator).
# Banding recall is the same trade as the batch MinHash plan
# (functions/dedup.py): a true near-dup pair collides in >= 1 band
# with the usual S-curve probability; missed-band pairs are the
# documented recall cost, measured by the gate query, never silent.
#
# Memory trade (documented, deliberate): each entry stores its
# signature in EVERY band bucket (bands x sig_bytes per doc) so a
# probe is one hop; at 100 TB one would store signatures once in an
# id-routed shard and pay a second lookup hop instead.


def _encode_id(i):
    """(str, kind) round-trip encoding shared by both snapshot formats
    (ids may mix int and string across epochs)."""
    return str(i), ("i" if isinstance(i, (int, np.integer)) else "s")


def _decode_id(s: str, kind: str):
    return int(s) if kind == "i" else s


_SIG_FORMAT = "u8fold"  # stamped into near-dup snapshots; bump when
# _sig_compact (or render_spans_text) changes — old signatures are
# incomparable with new ones


def render_spans_text(spans) -> str:
    """Canonical text rendering of one interleaved document for
    near-dup shingling: text spans in offset order, media refs inlined
    as tokens (an image-only edit still counts as a change).  Part of
    the signature identity — snapshots bake it in, so changing it
    requires a ``_SIG_FORMAT`` bump."""
    parts = []
    for s in sorted(spans or [], key=lambda x: x.get("offset") or 0):
        parts.append(s.get("text") or s.get("media_ref") or "")
    return "\n".join(parts)


def _sig_compact(sigs: np.ndarray) -> np.ndarray:
    """(n, num_perm) uint64 MinHash values → (n, num_perm) uint8: the
    verify stage only tests per-permutation EQUALITY, so one mixed
    byte per perm suffices.  Collision bias: P(equal bytes | unequal
    values) = 1/256, inflating the Jaccard estimate by (1-J)/256 —
    an order of magnitude under the 64-perm estimator noise (~0.06),
    and it cuts index memory and snapshot size ~6x (measured 6.7 GB →
    1.1 GB per 1M docs at 16 bands, BASELINE.md r4).  The fold is part
    of the snapshot format (stamped as ``sig_format`` in index.json):
    offers and probes must use the same function."""
    x = sigs.astype(np.uint64, copy=False) * np.uint64(0x9E3779B97F4A7C15)
    return (x >> np.uint64(56)).astype(np.uint8)


def _id_lt(a, b) -> bool:
    """Total order over possibly mixed-type ids (int epoch vs string
    epoch sharing one unsealed index): same kind compares naturally,
    ints order before strings — any fixed rule works, it only has to
    be deterministic."""
    ka, kb = isinstance(a, str), isinstance(b, str)
    if ka != kb:
        return kb  # int < str
    return a < b


@ray.remote(num_cpus=0)
class SigShard:
    """One bucket-space slice: ``bucket -> [(doc_id, sig_bytes,
    sealed)]`` plus the same per-batch idempotency keys as IndexShard.

    ``mark`` records the ids the keep phase decided to EXPORT; ``seal``
    then keeps only marked open entries — a dropped document's
    signature must NOT become history, or later epochs over-drop docs
    whose only near-dup was never exported (transitive chain-drops)."""

    def __init__(self):
        self._bands: dict = {}
        self._seen_keys: set = set()
        self._marked: set = set()

    def offer(self, key, buckets: list, ids: list, sigs: list) -> int:
        if key in self._seen_keys:
            return 0
        self._seen_keys.add(key)
        for b, i, s in zip(buckets, ids, sigs):
            self._bands.setdefault(b, []).append((i, s, False))
        return len(self._bands)

    def candidates(self, buckets: list) -> list:
        return [self._bands.get(b, []) for b in buckets]

    def mark(self, ids: list) -> None:
        self._marked.update(ids)

    def seal(self) -> int:
        marked = self._marked
        for b in list(self._bands):
            kept = [(i, s, True) for i, s, sealed in self._bands[b]
                    if sealed or i in marked]
            if kept:
                self._bands[b] = kept
            else:
                del self._bands[b]
        self._seen_keys = set()
        self._marked = set()
        return sum(len(v) for v in self._bands.values())

    def dump_sealed(self, path: str) -> int:
        import pyarrow.parquet as pq

        rows = [
            (b, e[0], e[1])
            for b, lst in self._bands.items()
            for e in lst if e[2]
        ]
        enc = [_encode_id(r[1]) for r in rows]
        t = pa.table(
            {
                "bucket": pa.array([r[0] for r in rows], type=pa.int64()),
                "doc_id": pa.array([e[0] for e in enc], type=pa.string()),
                "id_kind": pa.array([e[1] for e in enc],
                                    type=pa.string()),
                "sig": pa.array([r[2] for r in rows], type=pa.binary()),
            }
        )
        pq.write_table(t, path)
        return t.num_rows

    def load_sealed(self, path: str) -> int:
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        self._bands = {}
        for b, i, k, s in zip(t.column("bucket").to_pylist(),
                              t.column("doc_id").to_pylist(),
                              t.column("id_kind").to_pylist(),
                              t.column("sig").to_pylist()):
            self._bands.setdefault(b, []).append(
                (_decode_id(i, k), s, True)
            )
        return t.num_rows


def _atomic_snapshot_save(path: str, meta: dict, dump) -> int:
    """Shared save scaffolding for both index kinds: append-only
    guard FIRST (before any dump work), stale-tmp cleanup, shard-
    parallel dump via ``dump(tmp_dir)``, meta last, atomic rename."""
    import json
    import os
    import shutil

    if os.path.exists(path):
        raise FileExistsError(
            f"index save: {path} exists; saves are append-only "
            "snapshots — pick a fresh path per ingest epoch"
        )
    tmp = path + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)  # a crashed save with a different fan-out
        # must not leak stale shard files into the snapshot
    os.makedirs(tmp)
    n = dump(tmp)
    with open(os.path.join(tmp, "index.json"), "w") as f:
        json.dump({**meta, "entries": n}, f)
    os.replace(tmp, path)
    return n


def _load_snapshot_meta(path: str, expect_kind: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "index.json")) as f:
        meta = json.load(f)
    kind = meta.get("kind", "exact")  # pre-kind snapshots were exact
    if kind != expect_kind:
        raise ValueError(
            f"index load: {path} is a '{kind}' snapshot, not "
            f"'{expect_kind}' — exact and near-dup snapshots are not "
            "interchangeable"
        )
    return meta


class NearDupIndex:
    """Driver-side handle; MinHash parameters are part of the index
    identity (signatures from different parameters are incomparable),
    so they are pinned in the snapshot's ``index.json`` and a reload
    reconstructs the exact hasher."""

    def __init__(self, n_shards: int = 8, *, num_perm: int = 64,
                 bands: int = 16, shingle_k: int = 3, seed: int = 42):
        self.n_shards = n_shards
        self.params = {"num_perm": num_perm, "bands": bands,
                       "shingle_k": shingle_k, "seed": seed}
        self.shards = [SigShard.remote() for _ in range(n_shards)]

    def make_hasher(self):
        from ..functions.dedup import MinHashLSH

        return MinHashLSH(**self.params)

    def seal(self) -> int:
        return sum(ray.get([s.seal.remote() for s in self.shards]))

    def save(self, path: str) -> int:
        import os

        self.seal()

        def dump(tmp):
            return sum(ray.get([
                s.dump_sealed.remote(
                    os.path.join(tmp, f"shard-{i}.parquet"))
                for i, s in enumerate(self.shards)
            ]))

        return _atomic_snapshot_save(
            path,
            {"n_shards": self.n_shards, "params": self.params,
             "kind": "neardup", "sig_format": _SIG_FORMAT},
            dump,
        )

    @classmethod
    def load(cls, path: str) -> "NearDupIndex":
        import os

        meta = _load_snapshot_meta(path, "neardup")
        fmt = meta.get("sig_format")
        if fmt != _SIG_FORMAT:
            raise ValueError(
                f"NearDupIndex.load: {path} stores signatures in "
                f"format {fmt!r}, this build expects {_SIG_FORMAT!r} — "
                "signatures across formats are incomparable; re-ingest "
                "history to migrate"
            )
        index = cls(n_shards=meta["n_shards"], **meta["params"])
        ray.get([
            s.load_sealed.remote(os.path.join(path, f"shard-{i}.parquet"))
            for i, s in enumerate(index.shards)
        ])
        return index


def ingest_neardup(docs, index: NearDupIndex, *, threshold: float = 0.7,
                   keep_cols=("doc_id",), stats: dict | None = None):
    """Incremental NEAR-dup filter: a document drops when any
    LSH-candidate's estimated Jaccard is >= ``threshold`` AND the
    candidate is history (sealed) or an epoch-mate with a smaller id —
    the same deterministic pairwise keep-rule as ``emb_dedup_apply``
    (min id wins; no arrival-order races).  Requires a ``text``
    column and unique doc_ids across epochs.

    THREE phases, and the result is returned MATERIALIZED: offer
    (register this epoch's signatures, barrier), keep (probe + verify
    + filter, each batch also ``mark``s its survivors on the shards),
    and the implicit finalize — ``seal()``/``save()`` prune every
    unmarked entry, because a dropped document's signature must not
    suppress future documents (it was never exported).  Returning the
    keep pass lazily would let a caller seal before the marks landed,
    silently emptying the epoch's contribution — hence the internal
    materialize.

    The candidate-verify loop is per document over its (few) bucket
    hits, with the signature comparison itself vectorized across all
    of a document's candidates."""
    shards, n = index.shards, index.n_shards
    hasher = index.make_hasher()
    bands = index.params["bands"]

    def _sigs_buckets(batch: pa.Table):
        from ..functions.dedup import band_buckets

        texts = batch.column("text").to_pylist()
        ids_np = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = [i.item() if hasattr(i, "item") else i for i in ids_np]
        sigs = hasher.signature_batch(texts)
        buckets = band_buckets(sigs, bands) if len(texts) else \
            np.empty((0, bands), dtype=np.int64)
        return ids, sigs, buckets

    def offer(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([0], type=pa.int64())})
        ids, sigs, buckets = _sigs_buckets(batch)
        compact = _sig_compact(sigs)
        sig_bytes = [s.tobytes() for s in compact]  # once per doc,
        # not once per (doc, band); uint8-folded (see _sig_compact)
        key = min(ids)
        flat_b = buckets.reshape(-1)
        flat_i = np.repeat(np.arange(len(ids)), bands)
        shard_of = flat_b % n
        refs = []
        for s in np.unique(shard_of):
            m = shard_of == s
            di = flat_i[m]
            refs.append(shards[int(s)].offer.remote(
                key,
                flat_b[m].tolist(),
                [ids[j] for j in di],
                [sig_bytes[j] for j in di],
            ))
        ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows],
                                       type=pa.int64())})

    counts = docs.map_batches(offer, batch_format="pyarrow").materialize()
    if stats is not None:
        stats["n_input"] = sum(r["n"] for r in counts.take_all())

    cols = list(keep_cols)

    def keep(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch.select(cols)
        ids, sigs, buckets = _sigs_buckets(batch)
        own_compact = _sig_compact(sigs)
        uniq = np.unique(buckets.reshape(-1))
        shard_of = uniq % n
        bucket_entries: dict = {}
        refs, groups = [], []
        for s in np.unique(shard_of):
            m = shard_of == s
            groups.append(uniq[m])
            refs.append(shards[int(s)].candidates.remote(
                uniq[m].tolist()))
        for grp, res in zip(groups, ray.get(refs)):
            for b, entries in zip(grp, res):
                bucket_entries[int(b)] = entries
        keep_mask = np.ones(len(ids), dtype=bool)
        for j, own in enumerate(ids):
            cand: dict = {}
            for b in buckets[j]:
                for cid, csig, sealed in bucket_entries.get(int(b), []):
                    if cid != own:
                        cand[cid] = (csig, sealed)
            if not cand:
                continue
            mat = np.frombuffer(
                b"".join(c[0] for c in cand.values()),
                dtype=np.uint8,
            ).reshape(len(cand), -1)
            sims = (mat == own_compact[j]).mean(axis=1)
            for (cid, (_, sealed)), sim in zip(cand.items(), sims):
                if sim >= threshold and (sealed or _id_lt(cid, own)):
                    keep_mask[j] = False
                    break
        # survivors become this epoch's history candidates: mark them
        # on every shard holding one of their band entries (mark is
        # idempotent, so Ray task retries are safe)
        kept_idx = np.nonzero(keep_mask)[0]
        if len(kept_idx):
            mark_refs = []
            kept_flat = np.isin(flat_doc := np.repeat(
                np.arange(len(ids)), bands), kept_idx)
            flat_b = buckets.reshape(-1)
            shard_of = flat_b % n
            for s in np.unique(shard_of[kept_flat]):
                m = kept_flat & (shard_of == s)
                mark_refs.append(shards[int(s)].mark.remote(
                    list({ids[j] for j in flat_doc[m]})))
            ray.get(mark_refs)
        return batch.filter(pa.array(keep_mask)).select(cols)

    return docs.map_batches(keep, batch_format="pyarrow").materialize()
