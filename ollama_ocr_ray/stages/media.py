"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by actor-pool ``map_batches`` stages.

The reference touches media only as whole image files fed to external
engines (cv2/PIL loads at ``/root/reference/ocr_router.py:42,80-82``,
base64 payloads at ``/root/reference/ollama_cloud_ocr.py:165-180``).
At 100 TB the engine instead treats media as columns:

    media(media_ref: string, payload: binary, media_type: string,
          width:int32, height:int32, n_frames:int32, sample_rate:int32)

and every media transform is a stateful stage over Arrow batches.  The
actual codec work (JPEG decode, audio resample, video frame extraction)
needs libraries this container does not ship (pillow / libav), so each
stage resolves a decoder at actor init via import-try and otherwise
uses a clearly-marked deterministic fake; the Ray-side plumbing —
schema, batch sizing, actor signature, zero-copy binary handling,
output layout — is real and tested.

Scale notes: binary payloads dominate block size, so these stages run
with small ``batch_size`` (payload-count, not row-count, is what must
fit in a worker heap) and the payload column is dropped as early as the
pipeline allows (decode → features keeps only the feature vector).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_frames", pa.int32()),
        pa.field("sample_rate", pa.int32()),
    ]
)

FEATURE_DIM = 32


def synth_media_table(refs: list[str], media_type: str = "image") -> pa.Table:
    """Deterministic synthetic media rows: payload bytes are a pure
    function of media_ref (the corpus-side analog of the pixel content
    being determined by the file, ``ocr_router.py:80-82``)."""
    payloads, widths, heights, frames, rates = [], [], [], [], []
    for ref in refs:
        digest = hashlib.sha256(ref.encode()).digest()
        # pseudo-payload: repeatable bytes, size varies by ref
        size = 256 + digest[0] * 16
        payloads.append((digest * ((size // len(digest)) + 1))[:size])
        widths.append(16 + digest[1] % 64)
        heights.append(16 + digest[2] % 64)
        frames.append(1 if media_type == "image" else 1 + digest[3] % 30)
        rates.append(0 if media_type != "audio" else 8000 + 100 * (digest[4] % 80))
    return pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array([media_type] * len(refs)),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "n_frames": pa.array(frames, type=pa.int32()),
            "sample_rate": pa.array(rates, type=pa.int32()),
        }
    )


def _load_pillow():
    """Import-try for a real image codec; None in this container."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class MediaDecoder:
    """Actor-pool stage: payload binary → decoded pixel/PCM summary.

    ``__init__`` resolves the codec once per actor (the load-once
    pattern of ``TrOCREngine``, ``ocr_router.py:31-46``); ``__call__``
    decodes a whole Arrow batch.  Without a real codec the "decode" is
    a deterministic fake: a seeded byte-histogram standing in for pixel
    statistics.  STUB: replace ``_fake_decode`` with the real codec
    path when pillow/libav are available.
    """

    def __init__(self, strict: bool = False, force_fake: bool = False):
        # resolve the codec ONCE per actor; pillow is the real path when
        # importable, the deterministic fake is the fallback (and is
        # forceable for reproducible tests).  strict=True refuses to run
        # without a real codec.
        self._codec = None if force_fake else _load_pillow()
        self._strict = strict
        self._decode = (
            self._real_decode if self._codec is not None else self._fake_decode
        )

    def _fake_decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        # deterministic stand-in for decoded pixels: byte histogram
        counts = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                             minlength=256).astype(np.float32)
        return counts / max(1, len(payload))

    def _real_decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        """Pillow path: decode the image bytes, grayscale, normalized
        256-bin pixel histogram — same output contract as the fake, so
        downstream stages are codec-agnostic.  Undecodable payloads
        fall back to the byte histogram (inline-error-and-continue,
        the per-page semantics of ``ocr_router.py:296-298``)."""
        import io

        try:
            img = self._codec.open(io.BytesIO(payload)).convert("L")
        except Exception:
            return self._fake_decode(payload, width, height)
        px = np.asarray(img, dtype=np.uint8).ravel()
        counts = np.bincount(px, minlength=256).astype(np.float32)
        return counts / max(1, len(px))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._codec is None and self._strict:
            raise NotImplementedError(
                "no image codec in this environment; "
                "install pillow or run with strict=False (deterministic fake)"
            )
        batch = batch.combine_chunks()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        hists = np.stack(
            [self._decode(p, w, h) for p, w, h in zip(payloads, widths, heights)]
        )
        mean = hists.mean(axis=1)
        std = hists.std(axis=1)
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "media_type": batch.column("media_type"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "decoded_mean": pa.array(mean, type=pa.float64()),
                "decoded_std": pa.array(std, type=pa.float64()),
                "byte_len": pa.array(
                    [len(p) for p in payloads], type=pa.int64()
                ),
            }
        )


class FeatureExtractor:
    """Actor-pool stage: payload binary → fixed-dim feature vector
    (list<float>), the embedding step of a multimodal training
    pipeline.  The model load happens once per actor; the fake model
    projects the byte histogram through a seeded random matrix —
    deterministic, shaped exactly like a real encoder output."""

    def __init__(self, dim: int = FEATURE_DIM, seed: int = 7):
        rng = np.random.default_rng(seed)
        self._proj = rng.standard_normal((256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p in payloads:
            hist = np.bincount(np.frombuffer(p, dtype=np.uint8),
                               minlength=256).astype(np.float32)
            v = hist @ self._proj
            n = np.linalg.norm(v)
            feats.append((v / n if n else v).astype(np.float32))
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "feature": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def resize_plan_batch(batch: pa.Table, *, max_side: int = 32) -> pa.Table:
    """Stateless resize stage (vectorized): computes the target geometry
    and scale factor per row with pyarrow/numpy; the pixel resample
    itself is the stubbed codec step.  Keeping the plan separate from
    the resample means the Arrow-side layout is fully testable."""
    import pyarrow.compute as pc

    batch = batch.combine_chunks()
    w = np.asarray(batch.column("width"), dtype=np.float64)
    h = np.asarray(batch.column("height"), dtype=np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    return batch.append_column(
        "scale", pa.array(scale, type=pa.float64())
    ).append_column(
        "out_width", pa.array(np.round(w * scale).astype(np.int32))
    ).append_column(
        "out_height", pa.array(np.round(h * scale).astype(np.int32))
    )


def frame_sample_batch(batch: pa.Table, *, every: int = 5) -> pa.Table:
    """Video frame sampling: one output row per sampled frame index —
    the media analog of the PDF page explode (``ocr_router.py:105-119``),
    flat-map shaped, order carried by ``frame_idx``."""
    batch = batch.combine_chunks()
    n_frames = np.asarray(batch.column("n_frames"), dtype=np.int64)
    counts = np.maximum(1, (n_frames + every - 1) // every)
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    frame_idx = (
        np.concatenate([np.arange(c, dtype=np.int64) for c in counts]) * every
        if len(batch)
        else np.array([], dtype=np.int64)
    )
    refs = batch.column("media_ref").take(pa.array(parent))
    return pa.table(
        {
            "media_ref": refs,
            "frame_idx": pa.array(frame_idx, type=pa.int32()),
        }
    )


def media_feature_pipeline(media_ds, *, batch_size: int = 32,
                           concurrency=(2, 8)):
    """media table Dataset → (media_ref, feature) Dataset.

    Small batch_size: payloads are the block-size driver (see module
    docstring); concurrency × batch_size × payload bytes is the
    per-stage heap bound.
    """
    return media_ds.map_batches(
        FeatureExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
