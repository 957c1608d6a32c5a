"""OCR of media spans — the canonical stateful actor-pool stage.

Engine analog of ``TrOCREngine`` (``/root/reference/ocr_router.py:31-46``):
the reference constructs the model once for a whole batch run
(``ocr_router.py:388-389``) and threads it through every call; here the
model loads once per actor in ``__init__`` and ``__call__`` transcribes a
whole Arrow batch — wired as
``map_batches(OcrModel, concurrency=(min,max), batch_size=B,
batch_format='pyarrow')``.

The sandbox has no vision model, so the "model" is the deterministic
transcription contract of ``spec.mock_transcript`` plus two
configurable inference-cost knobs (mirroring the determinism knobs of
``ollama_local_ocr.py:143-144``):

- ``burn_iters``: CPU hash iterations per media span — a compute-bound
  stand-in (in-process model like TrOCR, ``ocr_router.py:31-46``);
- ``latency_ms``: wall latency per media span, charged as ONE batched
  sleep per call — a latency-bound stand-in (GPU / remote inference
  like the Ollama API path, whose 30-60s/image cost is service
  latency, not local CPU: ``ollama_local_ocr.py:202``).

Corrupt media become inline error spans and processing continues — the
per-page error semantics of ``ocr_router.py:296-298``.

Adds an ``ocr_ms`` column (per-row amortized batch OCR latency) consumed
by the lineage/metrics sink.
"""

from __future__ import annotations

import hashlib
import time

import numpy as np
import pyarrow as pa

from ..spec import (CORRUPT_SUFFIX, ERROR_TEXT, mock_transcript,
                    mode_transcript, resolve_policy)


class OcrModel:
    """Callable-class stage: __init__ once per actor, __call__ per batch."""

    def __init__(self, burn_iters: int = 0, latency_ms: float = 0.0,
                 policy: str = "text", media_store=None,
                 stamp_batches: bool = False):
        # "load the model": in the real engine this is where weights land
        # on the device; here we pre-touch the transcription vocab and
        # keep the cost knobs.  ``policy`` is the mode dispatch of the
        # reference's --mode flag (R4, ``ollama_cloud_ocr.py:744-788``);
        # the 'multi' policy fans each media span into ordered sub-spans
        # (R9) — sub indices keep reassembly exact.
        #
        # ``media_store`` is the broadcast media-sidecar lookup of
        # SURVEY §2.7: a {media_ref: payload bytes} mapping (pass a
        # ``ray.put`` ObjectRef so the store ships to each actor ONCE,
        # not per batch) resolved here, inside the actor — media bytes
        # never enter the shuffle path.  Absent a store, the payload is
        # the deterministic content function of the ref (synthetic
        # corpus contract).
        self.burn_iters = int(burn_iters)
        self.latency_ms = float(latency_ms)
        resolve_policy(policy)  # unknown policy name fails fast, per actor
        self.policy = policy
        try:
            import ray

            if isinstance(media_store, ray.ObjectRef):
                media_store = ray.get(media_store)
        except ImportError:
            pass
        self.media_store = media_store
        self.stamp_batches = stamp_batches  # test hook: tag rows with call id
        self._calls = 0
        self._warm = mock_transcript("media://warmup/0")

    def resolve_media(self, ref: str) -> bytes | None:
        """media_ref → payload bytes via the broadcast sidecar store;
        None when no store is configured (ref-keyed mock contract)."""
        if self.media_store is None:
            return None
        return self.media_store.get(ref)

    MISSING_MEDIA = "[Error processing page: media not found: {ref}]"

    def _transcribe_key(self, ref: str):
        """(key, ok): transcription key for a media span.  With a sidecar
        store the mock model "reads the pixels" — the transcript is a
        function of the PAYLOAD, so two refs with identical bytes
        transcribe identically; a ref missing from the store is a data
        error (inline error span, processing continues)."""
        if self.media_store is None:
            return ref, True
        payload = self.media_store.get(ref)
        if payload is None:
            return None, False
        return "payload:" + hashlib.sha256(payload).hexdigest(), True

    def _burn(self, ref: str) -> None:
        # deterministic stand-in for per-span compute cost
        h = ref.encode()
        for _ in range(self.burn_iters):
            h = hashlib.sha256(h).digest()

    def simulate_latency(self, n_media: int) -> None:
        """One batched sleep modeling inference latency for n_media spans
        (batched inference amortizes per-call overhead; per-span cost is
        what scales)."""
        if self.latency_ms > 0.0 and n_media > 0:
            time.sleep(self.latency_ms * n_media / 1e3)

    def _stamp(self, t: pa.Table) -> pa.Table:
        if not self.stamp_batches:
            return t
        self._calls += 1
        import os

        tag = f"{os.getpid()}:{id(self)}:{self._calls}"
        return t.append_column("ocr_batch", pa.array([tag] * len(t)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        kind = np.asarray(batch.column("kind"))
        is_media = kind == "media"
        n = len(batch)
        if not is_media.any():
            return self._stamp(
                batch.append_column("ocr_ms", pa.array(np.zeros(n), type=pa.float64()))
            )
        t0 = time.perf_counter()
        refs = batch.column("media_ref").to_pylist()
        texts = batch.column("text").to_pylist()
        kinds = kind.tolist()
        media_idx = np.nonzero(is_media)[0]
        n_infer = sum(
            1 for i in media_idx if not refs[i].endswith(CORRUPT_SUFFIX)
        )
        self.simulate_latency(n_infer)
        if self.policy == "text":
            # fast path: exactly one output per media span, in place
            for i in media_idx:
                ref = refs[i]
                if ref.endswith(CORRUPT_SUFFIX):
                    kinds[i] = "error"
                    texts[i] = ERROR_TEXT
                else:
                    key, ok = self._transcribe_key(ref)
                    if not ok:
                        kinds[i] = "error"
                        texts[i] = self.MISSING_MEDIA.format(ref=ref)
                    else:
                        self._burn(ref)
                        kinds[i] = "ocr"
                        texts[i] = mock_transcript(key)
            elapsed_ms = (time.perf_counter() - t0) * 1e3
            per_row = elapsed_ms / len(media_idx)
            ocr_ms = np.zeros(n)
            ocr_ms[media_idx] = per_row
            return self._stamp(
                pa.table(
                    {
                        "doc_id": batch.column("doc_id"),
                        "offset": batch.column("offset"),
                        "sub": batch.column("sub"),
                        "kind": pa.array(kinds, type=pa.string()),
                        "text": pa.array(texts, type=pa.string()),
                        "media_ref": batch.column("media_ref"),
                        "ocr_ms": pa.array(ocr_ms, type=pa.float64()),
                    }
                )
            )
        # policy path: a media span may fan into ordered sub-spans (R9)
        docs = batch.column("doc_id").to_pylist()
        offs = batch.column("offset").to_pylist()
        subs = batch.column("sub").to_pylist()
        is_media_l = is_media.tolist()
        o_doc, o_off, o_sub, o_kind, o_text, o_ref, o_ms = (
            [], [], [], [], [], [], []
        )
        media_out_rows = []
        for i in range(n):
            if not is_media_l[i]:
                o_doc.append(docs[i]); o_off.append(offs[i])
                o_sub.append(subs[i]); o_kind.append(kinds[i])
                o_text.append(texts[i]); o_ref.append(refs[i])
                o_ms.append(0.0)
                continue
            ref = refs[i]
            if ref.endswith(CORRUPT_SUFFIX):
                outs = [("error", ERROR_TEXT)]
            else:
                key, ok = self._transcribe_key(ref)
                if not ok:
                    outs = [("error", self.MISSING_MEDIA.format(ref=ref))]
                else:
                    self._burn(ref)
                    outs = [("ocr", t)
                            for t in mode_transcript(key, self.policy)]
            for j, (k, t) in enumerate(outs):
                o_doc.append(docs[i]); o_off.append(offs[i])
                o_sub.append(j); o_kind.append(k)
                o_text.append(t); o_ref.append(ref)
                media_out_rows.append(len(o_ms))
                o_ms.append(0.0)
        # amortized batch OCR latency, measured AFTER the work
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        per_row = elapsed_ms / max(1, len(media_out_rows))
        for r in media_out_rows:
            o_ms[r] = per_row
        return self._stamp(
            pa.table(
                {
                    "doc_id": pa.array(o_doc, type=pa.string()),
                    "offset": pa.array(o_off, type=pa.int32()),
                    "sub": pa.array(o_sub, type=pa.int32()),
                    "kind": pa.array(o_kind, type=pa.string()),
                    "text": pa.array(o_text, type=pa.string()),
                    "media_ref": pa.array(o_ref, type=pa.string()),
                    "ocr_ms": pa.array(o_ms, type=pa.float64()),
                }
            )
        )
