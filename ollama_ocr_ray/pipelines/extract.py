"""Pipeline composition: documents Dataset → extracted Dataset.

Two physical plans for the same logical extraction (identical output
under the span-equality contract):

``extract_pipeline`` — the canonical salted-split plan of SURVEY.md §3.4:
    explode to span rows → stateless extract (html/pdf/text) → OCR actor
    pool → groupby(doc_id) reassembly.  One all-to-all exchange
    (the groupby); a media-heavy document's spans spread across many
    blocks and actors, so no single actor drowns in an OCR-dense
    document (the reference's sequential 100-page-PDF problem,
    ``/root/reference/ocr_router.py:279-298``).

``fused_pipeline`` — the zero-shuffle plan: one actor-pool stage that
    processes each document's spans in place (documents are independent
    rows).  No exchange at all, minimal data movement; its skew unit is
    the whole document, so a single pathological document serializes on
    one actor.  The engine defaults to the canonical plan (bounded skew)
    and offers the fused plan where corpora are known to be uniform.
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import EXTRACTED_SCHEMA, SUMMARY_SCHEMA
from ..spec import CORRUPT_SUFFIX, ERROR_TEXT, mock_transcript, unsupported_text
from ..stages.explode import explode_batch
from ..stages.extract import extract_batch
from ..stages.html_extract import extract_html_stage
from ..stages.ocr import OcrModel
from ..stages.pdf_parse import parse_pdf_stage
from ..stages.reassemble import REASSEMBLED_SCHEMA, reassemble_group


def extract_pipeline(
    docs,
    *,
    ocr_burn: int = 0,
    ocr_batch_size: int = 512,
    ocr_concurrency=(2, 8),
    with_stats: bool = False,
):
    """documents Dataset → extracted Dataset (EXTRACTED_SCHEMA [+stats]).

    Canonical plan: span-granular parallelism + one groupby(doc_id)
    exchange for reassembly.
    """
    spans = (
        docs.map_batches(explode_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(extract_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            OcrModel,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=ocr_batch_size,
            concurrency=ocr_concurrency,
            num_cpus=1,
            fn_constructor_kwargs={"burn_iters": ocr_burn},
        )
    )
    out = spans.groupby("doc_id").map_groups(
        reassemble_group, batch_format="pyarrow"
    )
    if with_stats:
        return out
    return out.select_columns(["doc_id", "spans"])


class FusedExtractor:
    """Whole-document extraction in one stateful stage (zero shuffle).

    Holds the OCR model like ``OcrModel`` and applies the same per-kind
    contract via the shared stage parsers; span order never leaves the
    row, so no reassembly exchange is needed.
    """

    def __init__(self, burn_iters: int = 0, with_stats: bool = False):
        self._ocr = OcrModel(burn_iters=burn_iters)
        self.with_stats = with_stats

    def _extract_doc(self, spans: list[dict]) -> list[dict]:
        out = []
        for s in sorted(spans, key=lambda s: s["offset"]):
            kind = s["kind"]
            if kind == "text":
                t = s["text"].strip()
                if t:
                    out.append(("text", t, ""))
            elif kind == "html":
                out.extend(("text", t, "") for t in extract_html_stage(s["text"]))
            elif kind == "pdf":
                out.extend(("text", t, "") for t in parse_pdf_stage(s["text"]))
            elif kind == "media":
                ref = s["media_ref"]
                if ref.endswith(CORRUPT_SUFFIX):
                    out.append(("error", ERROR_TEXT, ref))
                else:
                    self._ocr._burn(ref)
                    out.append(("ocr", mock_transcript(ref), ref))
            else:
                out.append(("error", unsupported_text(kind), s["media_ref"]))
        return [
            {"kind": k, "text": t, "media_ref": m, "order": i}
            for i, (k, t, m) in enumerate(out)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time

        rows = batch.to_pylist()
        out = []
        for r in rows:
            t0 = time.perf_counter()
            spans = self._extract_doc(r["spans"])
            row = {"doc_id": r["doc_id"], "spans": spans}
            if self.with_stats:
                row["engine"] = spans[0]["kind"] if spans else ""
                row["chars"] = sum(len(s["text"]) for s in spans)
                row["n_spans"] = len(spans)
                row["n_errors"] = sum(1 for s in spans if s["kind"] == "error")
                row["ocr_ms"] = (time.perf_counter() - t0) * 1e3
            out.append(row)
        schema = REASSEMBLED_SCHEMA if self.with_stats else EXTRACTED_SCHEMA
        return pa.Table.from_pylist(out, schema=schema)


def fused_pipeline(docs, *, ocr_burn: int = 0, batch_size: int = 64,
                   concurrency=(2, 8), with_stats: bool = False):
    """documents Dataset → extracted Dataset, zero-shuffle plan."""
    return docs.map_batches(
        FusedExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"burn_iters": ocr_burn, "with_stats": with_stats},
    )


def summary_table(extracted_with_stats):
    """Per-document summary (the reference CSV row analog,
    ``ocr_router.py:406-408``) from a with_stats extraction result."""

    def to_summary(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "engine": batch.column("engine"),
                "chars": batch.column("chars"),
                "spans": batch.column("n_spans"),
                "errors": batch.column("n_errors"),
            }
        ).cast(SUMMARY_SCHEMA)

    return extracted_with_stats.map_batches(to_summary, batch_format="pyarrow")


def render_compat_text(spans: list[dict]) -> str:
    """Compat view: the reference's joined-text rendering with
    ``--- Page N ---`` separators (``ocr_router.py:294,301``) over an
    extracted span sequence."""
    parts = [
        f"\n\n--- Page {s['order'] + 1} ---\n\n{s['text']}"
        for s in sorted(spans, key=lambda s: s["order"])
    ]
    return "".join(parts).strip()
