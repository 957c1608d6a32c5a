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

from contextlib import contextmanager

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import EXTRACTED_SCHEMA, SUMMARY_SCHEMA
from ..spec import CORRUPT_SUFFIX, ERROR_TEXT, unsupported_text
from ..stages.explode import explode_batch
from ..stages.extract import extract_batch
from ..stages.html_extract import extract_html_stage
from ..stages.ocr import OcrModel
from ..stages.pdf_parse import parse_pdf_stage
from ..stages.reassemble import REASSEMBLED_SCHEMA, reassemble_sorted_block

# the span-row layout entering the reassembly exchange (explode →
# extract → OCR output); exact_segment_fold needs it statically
SPAN_ROW_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("offset", pa.int32()), ("sub", pa.int32()),
     ("kind", pa.string()), ("text", pa.string()),
     ("media_ref", pa.string()), ("ocr_ms", pa.float64())]
)


_BURN_MS_PER_ITER = 0.00055  # measured sha256 cost on the bench host


def _cluster_cpus() -> int:
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _pool_sizing(ocr_burn: int, ocr_latency_ms: float):
    """(concurrency, num_cpus_per_actor, batch_size) for the OCR pool.

    A high pool minimum matters: Ray's autoscaling pool ramps lazily and
    tasks already queued on the first actors never migrate, so a (2, N)
    pool on a short job runs at ~3x parallelism regardless of N
    (measured in BASELINE.md).  Leaving a little CPU slack keeps
    read/shuffle tasks from starving; an exact-CPUs fixed pool
    deadlocks the stream.

    When inference cost is latency-bound (GPU/remote model — the
    reference's real profile, ``ollama_local_ocr.py:202``), actors
    sleep more than they compute, so run 2 actors per CPU
    (num_cpus=0.5) and larger batches to amortize driver dispatch;
    compute-bound mocks get 1 actor per CPU.
    """
    cpus = _cluster_cpus()
    latency_bound = ocr_latency_ms > ocr_burn * _BURN_MS_PER_ITER
    if latency_bound:
        # Round-2 sweep (BASELINE.md): ~3.4 actors per CPU at 0.25 CPU
        # each hides sleep best (120k docs / 32 CPUs: 110 actors beat
        # 64@0.5 by ~1.4x on both plans).  Footprint tops out at 7/8 of
        # the cluster, so the pool MAX (not just the min) leaves CPU
        # slack for read/shuffle tasks.  On tiny clusters the 7/8 rule
        # rounds to LESS than one whole spare CPU (4 CPUs -> 3.5 used,
        # 0.5 free) and the read stage starves outright (measured hang
        # at num_cpus=4, round 4): cap the footprint at cpus-1 so at
        # least one full CPU always serves the stream.
        n_actors = min((7 * cpus) // 2, 4 * (cpus - 1))
        return (max(2, n_actors - 2), max(2, n_actors)), 0.25, 128
    # compute-bound: 1 actor per CPU, max capped below the cluster so
    # the stream never starves (an exact-CPUs pool stalls, BASELINE.md)
    n_actors = max(2, cpus - 1)
    return (max(2, n_actors - 1), n_actors), 1, 64


def _clamp_pool(concurrency, num_cpus):
    """Clamp an EXPLICIT pool request to the cluster: a pool whose CPU
    footprint covers every core starves the read stage and the stream
    deadlocks (measured: the test-scale (4, 8)x1-CPU pool on a 4-CPU
    session hangs outright).  Leave one full CPU free."""
    budget = max(1, int((_cluster_cpus() - 1) / num_cpus))
    if isinstance(concurrency, tuple):
        lo, hi = concurrency
        return (max(1, min(lo, budget)), max(1, min(hi, budget)))
    return max(1, min(concurrency, budget))


class SpanExtractor:
    """explode + extract + OCR in ONE actor stage (document blocks in,
    span rows out).  Same logical result as chaining the three
    map_batches; one operator instead of three cuts per-task driver
    dispatch ~3x on the canonical plan (BASELINE.md: the 3-op chain is
    dispatch-bound at ~5 tasks/s on the bench host)."""

    def __init__(self, offset_range=None, **ocr_kwargs):
        self._ocr = OcrModel(**ocr_kwargs)
        self.offset_range = offset_range

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._ocr(
            extract_batch(
                explode_batch(batch, offset_range=self.offset_range)
            )
        )


def extract_pipeline(
    docs,
    *,
    ocr_burn: int = 0,
    ocr_latency_ms: float = 0.0,
    ocr_batch_size: int = 512,
    ocr_concurrency=None,
    ocr_num_cpus=None,
    policy: str = "text",
    offset_range=None,
    media_store=None,
    fuse_stages: bool = True,
    with_stats: bool = False,
    reassembly_partitions: int | None = None,
    model=None,
    metrics_sink=None,
    metrics_tag=None,
):
    """documents Dataset → extracted Dataset (EXTRACTED_SCHEMA [+stats]).

    Canonical plan: span-granular parallelism + one groupby(doc_id)
    exchange for reassembly.  ``fuse_stages`` (default) runs
    explode/extract/OCR inside one actor stage (``SpanExtractor``) —
    measurably less driver dispatch overhead; False keeps the
    three-operator chain (stateless explode/extract as tasks), which is
    preferable when the stateless stages should scale independently of
    the actor pool (e.g. real GPU actors with num_gpus set).
    """
    auto_conc, auto_cpus, _ = _pool_sizing(ocr_burn, ocr_latency_ms)
    if ocr_concurrency is None:
        ocr_concurrency = auto_conc
    if ocr_num_cpus is None:
        ocr_num_cpus = auto_cpus
    ocr_concurrency = _clamp_pool(ocr_concurrency, ocr_num_cpus)
    # The streaming executor reserves ~50% of CPUs per operator; with
    # three exchange operators downstream that halves the OCR pool's
    # effective task budget (measured: 64 of 110 actors busy).  The
    # pool max already leaves explicit CPU slack, so release the
    # reservation.  Scope caveat: ``docs.context`` is this DATASET's
    # context (not the process singleton), but pipelines later derived
    # from the SAME ``docs`` object inherit it — callers that reuse one
    # Dataset across pipelines should pass a fresh read (every caller
    # in this repo does).
    docs.context.op_resource_reservation_enabled = False
    ocr_kwargs = {
        "burn_iters": ocr_burn,
        "latency_ms": ocr_latency_ms,
        "policy": policy,
        "media_store": media_store,
        "model": model,
        "metrics_sink": metrics_sink,
        "metrics_tag": metrics_tag,
    }
    if fuse_stages:
        spans = docs.map_batches(
            SpanExtractor,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=ocr_batch_size,
            concurrency=ocr_concurrency,
            num_cpus=ocr_num_cpus,
            fn_constructor_kwargs={"offset_range": offset_range, **ocr_kwargs},
        )
    else:
        spans = (
            docs.map_batches(explode_batch, batch_format="pyarrow",
                             zero_copy_batch=True,
                             fn_kwargs={"offset_range": offset_range})
            .map_batches(extract_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(
                OcrModel,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=ocr_batch_size,
                concurrency=ocr_concurrency,
                num_cpus=ocr_num_cpus,
                fn_constructor_kwargs=ocr_kwargs,
            )
        )
    # Coalesce map-output blocks before the exchange: every sort-map,
    # sort-reduce and reassemble task downstream costs one driver
    # dispatch, and the driver sustains only ~16-44 dispatches/s on
    # this host (BASELINE.md §dispatch) — trimming 214->64 blocks cut
    # the post-barrier tail ~2x at 120k docs.  The default targets
    # 2 blocks/CPU; at larger scale pass ``reassembly_partitions`` to
    # keep post-shuffle blocks near the ~128 MB target.  CAVEAT
    # (measured, BASELINE.md r3): on a SMALL corpus the default EXPANDS
    # the block count (8 read blocks -> 64), and those 64 post-sort
    # dispatches cost ~1-2 s — pass 0 to skip the coalesce entirely
    # when the input is already a handful of blocks.
    if reassembly_partitions is None:
        reassembly_partitions = max(16, 2 * _cluster_cpus())
    if reassembly_partitions:
        spans = spans.repartition(reassembly_partitions)
    # Reassembly exchange: sort on doc_id ONLY (a multi-key distributed
    # sort could place a range boundary inside a document), then one
    # vectorized many-docs-per-block pass — not groupby().map_groups,
    # whose per-group Python call dominated the round-1 bench (2.1x the
    # fused plan; see reassemble_sorted_block docstring).  The fold runs
    # through exact_segment_fold (round-4 hardening): a document whose
    # span rows exceed the block-size target splits its sorted run, and
    # the old per-block pass would emit it twice with partial spans —
    # the O2 ordering invariant's one remaining hole.
    from ..functions.folds import exact_segment_fold

    out = exact_segment_fold(
        spans.sort("doc_id"), key_cols=["doc_id"],
        fold=reassemble_sorted_block,
        raw_schema=SPAN_ROW_SCHEMA, out_schema=REASSEMBLED_SCHEMA,
        op="reassemble",
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

    def __init__(self, burn_iters: int = 0, latency_ms: float = 0.0,
                 policy: str = "text", offset_range=None, media_store=None,
                 with_stats: bool = False, model=None,
                 metrics_sink=None, metrics_tag=None):
        self._ocr = OcrModel(burn_iters=burn_iters, latency_ms=latency_ms,
                             policy=policy, media_store=media_store,
                             model=model, metrics_sink=metrics_sink,
                             metrics_tag=metrics_tag)
        self.policy = policy
        self.offset_range = offset_range
        self.with_stats = with_stats

    def _extract_doc(self, spans: list[dict]) -> tuple[list[dict], int]:
        out = []
        if self.offset_range is not None:
            lo, hi = self.offset_range
            spans = [s for s in spans if lo <= s["offset"] < hi]
        spans = sorted(spans, key=lambda s: s["offset"])
        # resolve the doc's media refs in one pass, transcribe them in
        # ONE batched inference call (the model seam batches per doc on
        # this plan; the canonical plan batches across documents)
        media_refs = [s["media_ref"] for s in spans if s["kind"] == "media"]
        status, keys, payloads = self._ocr.resolve_batch(media_refs)
        for k in keys:
            self._ocr._burn(k)
        outs_per_ok = self._ocr.infer_texts(payloads, keys)
        st_iter, ok_iter = iter(status), iter(outs_per_ok)
        for s in spans:
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
                st = next(st_iter)
                if st == "corrupt":
                    out.append(("error", ERROR_TEXT, ref))
                elif st == "missing":
                    out.append(
                        ("error", OcrModel.MISSING_MEDIA.format(ref=ref), ref)
                    )
                else:
                    out.extend(("ocr", t, ref) for t in next(ok_iter))
            else:
                out.append(("error", unsupported_text(kind), s["media_ref"]))
        return [
            {"kind": k, "text": t, "media_ref": m, "order": i}
            for i, (k, t, m) in enumerate(out)
        ], len(keys)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time

        t_call = time.perf_counter()
        rows = batch.to_pylist()
        out = []
        media_counts = []
        batch_media = 0
        for r in rows:
            t0 = time.perf_counter()
            spans, n_media = self._extract_doc(r["spans"])
            batch_media += n_media
            media_counts.append(n_media)
            row = {"doc_id": r["doc_id"], "spans": spans}
            if self.with_stats:
                row["engine"] = spans[0]["kind"] if spans else ""
                row["chars"] = sum(len(s["text"]) for s in spans)
                row["n_spans"] = len(spans)
                row["n_errors"] = sum(1 for s in spans if s["kind"] == "error")
                row["ocr_ms"] = (time.perf_counter() - t0) * 1e3
            out.append(row)
        # one batched sleep per call: batched inference amortizes per-call
        # latency; per-span cost is what scales (see OcrModel)
        t_sleep = time.perf_counter()
        self._ocr.simulate_latency(batch_media)
        if self.with_stats and batch_media:
            # amortize the batch sleep into each doc's ocr_ms by its
            # media-span share, so fused and canonical plans report the
            # same latency metric for the same corpus
            slept_ms = (time.perf_counter() - t_sleep) * 1e3
            for row, n_media in zip(out, media_counts):
                row["ocr_ms"] += slept_ms * n_media / batch_media
        self._ocr._record(len(rows), batch_media, t_call)
        schema = REASSEMBLED_SCHEMA if self.with_stats else EXTRACTED_SCHEMA
        return pa.Table.from_pylist(out, schema=schema)


def fused_pipeline(docs, *, ocr_burn: int = 0, ocr_latency_ms: float = 0.0,
                   batch_size: int | None = None, concurrency=None,
                   num_cpus=None, policy: str = "text", offset_range=None,
                   media_store=None, with_stats: bool = False, model=None,
                   metrics_sink=None, metrics_tag=None):
    """documents Dataset → extracted Dataset, zero-shuffle plan."""
    auto_conc, auto_cpus, auto_bs = _pool_sizing(ocr_burn, ocr_latency_ms)
    if concurrency is None:
        concurrency = auto_conc
    if num_cpus is None:
        num_cpus = auto_cpus
    concurrency = _clamp_pool(concurrency, num_cpus)
    if batch_size is None:
        batch_size = auto_bs
    return docs.map_batches(
        FusedExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        fn_constructor_kwargs={
            "burn_iters": ocr_burn,
            "latency_ms": ocr_latency_ms,
            "policy": policy,
            "offset_range": offset_range,
            "media_store": media_store,
            "with_stats": with_stats,
            "model": model,
            "metrics_sink": metrics_sink,
            "metrics_tag": metrics_tag,
        },
    )


def choose_plan(docs, *, ocr_burn: int = 0, ocr_latency_ms: float = 0.0,
                skew_threshold_s: float = 5.0, sample_docs: int = 512) -> str:
    """Pick the physical plan from a bounded skew probe.

    The skew unit of the fused plan is a whole document; its worst case
    is one doc monopolizing an actor for ``max_media_spans x per-span
    cost``.  Probe the first ``sample_docs`` documents (1-2 input
    blocks, re-read by the main run — bounded cost at any corpus size),
    estimate that worst case, and fall back to the canonical
    salted-split plan when it exceeds ``skew_threshold_s``.  A sample
    can miss rare pathological docs: callers that KNOW their corpus is
    heavy-tailed should force ``plan='canonical'`` (the guaranteed-
    bounded plan); the probe is a default, not a proof.
    """
    import pyarrow.compute as pc

    per_span_ms = ocr_latency_ms + ocr_burn * _BURN_MS_PER_ITER
    if per_span_ms <= 0:
        return "fused"
    try:
        sample = docs.limit(sample_docs).take_batch(
            sample_docs, batch_format="pyarrow"
        )
    except ValueError:
        # take_batch raises ValueError only for an exhausted/empty
        # dataset: nothing to probe, either plan is fine.  Real read
        # errors (corrupt parquet, permissions) propagate.
        return "fused"
    spans = sample["spans"]
    kinds = pc.struct_field(pc.list_flatten(spans), "kind")
    # per-doc media counts: segment the flattened kind array by offsets
    import numpy as np

    lengths = np.asarray(pc.list_value_length(spans))
    is_media = np.asarray(pc.equal(kinds, "media"))
    ends = np.cumsum(lengths)
    starts = ends - lengths
    csum = np.concatenate([[0], np.cumsum(is_media.astype(np.int64))])
    media_per_doc = csum[ends] - csum[starts]
    worst_s = float(media_per_doc.max(initial=0)) * per_span_ms / 1e3
    return "canonical" if worst_s > skew_threshold_s else "fused"


def auto_pipeline(docs, *, ocr_burn: int = 0, ocr_latency_ms: float = 0.0,
                  policy: str = "text", offset_range=None,
                  ocr_batch_size: int | None = None, ocr_concurrency=None,
                  ocr_num_cpus=None, with_stats: bool = False,
                  plan: str | None = None, model=None):
    """The engine's default: probe skew, then run the fused
    (zero-shuffle) plan for bounded-skew corpora or the canonical
    salted-split plan for heavy-tailed ones.  Returns (plan_name, ds).

    Tuning kwargs use the canonical (``ocr_``-prefixed) names and are
    translated for the fused plan, so callers can pass them portably —
    the probe, not the caller, decides which plan runs.  Note the
    batch-size unit differs by plan (span rows vs whole docs), so an
    explicit ``ocr_batch_size`` is only forwarded to the canonical plan.
    """
    if plan is None:
        plan = choose_plan(docs, ocr_burn=ocr_burn, ocr_latency_ms=ocr_latency_ms)
    if plan == "fused":
        out = fused_pipeline(docs, ocr_burn=ocr_burn,
                             ocr_latency_ms=ocr_latency_ms,
                             policy=policy, offset_range=offset_range,
                             concurrency=ocr_concurrency,
                             num_cpus=ocr_num_cpus,
                             with_stats=with_stats, model=model)
    else:
        out = extract_pipeline(docs, ocr_burn=ocr_burn,
                               ocr_latency_ms=ocr_latency_ms,
                               policy=policy, offset_range=offset_range,
                               ocr_concurrency=ocr_concurrency,
                               ocr_num_cpus=ocr_num_cpus,
                               with_stats=with_stats, model=model,
                               **({} if ocr_batch_size is None
                                  else {"ocr_batch_size": ocr_batch_size}))
    return plan, out


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


REF_CSV_COLUMNS = ["file", "engine", "chars", "pages", "type"]


def compat_summary_rows(stats: pa.Table) -> pa.Table:
    """with_stats rows → the reference's literal CSV row shape
    (``ocr_router.py:386,406-408``: ``file, engine, chars, pages,
    type``): file = doc_id (the engine's document/file analog, SURVEY
    §1.1), pages = output span count (the page analog), type = 'pdf'
    for multi-span documents / 'image' for single-span ones — the
    reference's filename-suffix test re-expressed over the interleaved
    data model, where a document IS the ordered page sequence."""
    stats = stats.combine_chunks()
    pages = stats.column("n_spans").cast(pa.int64())
    return pa.table(
        {
            "file": stats.column("doc_id"),
            "engine": stats.column("engine"),
            "chars": stats.column("chars").cast(pa.int64()),
            "pages": pages,
            "type": pc.if_else(pc.greater(pages, 1),
                               pa.scalar("pdf"), pa.scalar("image")),
        }
    )


@contextmanager
def _ref_csv_writer(path: str):
    """Atomic reference-format CSV file: header row, tmp-file write,
    rename on success — the ONE emission convention shared by the
    single-file writer below and the runner's per-partition parts."""
    import csv
    import os

    tmp = path + ".tmp"
    with open(tmp, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(REF_CSV_COLUMNS)
        yield w
    os.replace(tmp, path)


def write_csv_table(rows: pa.Table, path: str) -> None:
    """One ``compat_summary_rows`` table → one reference-format CSV
    (atomic).  The bounded-size path (a partition's summary)."""
    with _ref_csv_writer(path) as w:
        w.writerows(zip(*(rows.column(c).to_pylist()
                          for c in REF_CSV_COLUMNS)))


def write_summary_csv(extracted_with_stats, path: str, *,
                      single_file: bool = False) -> None:
    """Reference-format CSV summary writer (K3 compat,
    ``ocr_router.py:378-386``).  Default: partitioned CSV parts via
    ``Dataset.write_csv`` (resumable, never one giant file).
    ``single_file=True`` streams the blocks — sorted by file for a
    stable byte-level artifact diff against the reference — into ONE
    csv at ``path``; driver-local convenience for compat checks, not
    the scale path."""
    ds = extracted_with_stats.map_batches(
        compat_summary_rows, batch_format="pyarrow")
    if not single_file:
        ds.write_csv(path)
        return
    with _ref_csv_writer(path) as w:
        for b in ds.sort("file").iter_batches(batch_size=4096,
                                              batch_format="pyarrow"):
            w.writerows(zip(*(b.column(c).to_pylist()
                              for c in REF_CSV_COLUMNS)))


def render_compat_text(spans: list[dict]) -> str:
    """Compat view: the reference's joined-text rendering with
    ``--- Page N ---`` separators (``ocr_router.py:294,301``) over an
    extracted span sequence."""
    parts = [
        f"\n\n--- Page {s['order'] + 1} ---\n\n{s['text']}"
        for s in sorted(spans, key=lambda s: s["order"])
    ]
    return "".join(parts).strip()


def corpus_summary(extracted_with_stats):
    """Global batch totals (G3, ``ollama_local_ocr.py:397-427``): one-row
    aggregate over the per-document stats — docs, spans, chars, errors,
    mean OCR ms — via Dataset.aggregate (tiny exchange)."""
    from ray.data.aggregate import Count, Mean, Sum

    return extracted_with_stats.aggregate(
        Count(alias_name="docs"),
        Sum("n_spans", alias_name="spans"),
        Sum("chars", alias_name="chars"),
        Sum("n_errors", alias_name="errors"),
        Mean("ocr_ms", alias_name="mean_ocr_ms"),
    )


RECEIPTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("order", pa.int32()),
        pa.field("media_ref", pa.string()),
        pa.field("store_name", pa.string()),
        pa.field("total_amount", pa.float64()),
        pa.field("date", pa.string()),
        pa.field("n_items", pa.int32()),
    ]
)


def structured_receipts(extracted):
    """Typed relational view over 'structured'-policy output: parses the
    receipt-JSON spans (the reference only ever emits that JSON as text,
    ``ollama_cloud_ocr.py:401-414`` — this closes the loop into typed
    Arrow columns a downstream pipeline can aggregate)."""
    import json

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            for s in r["spans"]:
                if s["kind"] != "ocr":
                    continue
                try:
                    obj = json.loads(s["text"])
                except (ValueError, TypeError):
                    continue
                if not isinstance(obj, dict) or "store_name" not in obj:
                    continue
                rows.append(
                    {
                        "doc_id": r["doc_id"],
                        "order": s["order"],
                        "media_ref": s["media_ref"],
                        "store_name": obj.get("store_name", ""),
                        "total_amount": float(obj.get("total_amount", 0.0)),
                        "date": obj.get("date", ""),
                        "n_items": len(obj.get("items", [])),
                    }
                )
        return pa.Table.from_pylist(rows, schema=RECEIPTS_SCHEMA)

    return extracted.map_batches(parse, batch_format="pyarrow")
