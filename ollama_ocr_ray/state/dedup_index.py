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
        """Seal, then persist every shard (parallel, atomic via
        tmp+rename of the directory)."""
        import json
        import os
        import shutil

        if os.path.exists(path):
            raise FileExistsError(
                f"DedupIndex.save: {path} exists; saves are append-only "
                "snapshots — pick a fresh path per ingest epoch"
            )
        self.seal()
        tmp = path + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # a crashed save with a different
            # fan-out must not leak stale shard files into the snapshot
        os.makedirs(tmp)
        n = sum(ray.get([
            s.dump_sealed.remote(os.path.join(tmp, f"shard-{i}.parquet"))
            for i, s in enumerate(self.shards)
        ]))
        with open(os.path.join(tmp, "index.json"), "w") as f:
            json.dump({"n_shards": self.n_shards, "entries": n}, f)
        os.replace(tmp, path)
        return n

    @classmethod
    def load(cls, path: str) -> "DedupIndex":
        import json
        import os

        with open(os.path.join(path, "index.json")) as f:
            meta = json.load(f)
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
