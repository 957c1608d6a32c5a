"""Resumable partitioned extraction runner.

Partition unit = one input data file of the documents table.  Each
partition runs the extraction pipeline as its own (internally parallel)
Dataset execution and commits atomically: output → ``_tmp`` dir →
rename → manifest record.  ``wave`` partitions execute concurrently
(each streaming execution submits Ray tasks; the scheduler interleaves
them), so the cluster stays saturated while commits stay
partition-granular.  A killed run resumes by fingerprint-matching the
manifest and redoing only missing partitions (SURVEY.md §4.3).
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..pipelines.extract import extract_pipeline, fused_pipeline
from ..sources.io import (list_input_files, read_documents_files,
                          write_extracted)
from .manifest import Manifest, partition_fingerprint


def _partition_metrics(part_dir: str) -> dict:
    import pyarrow.dataset as pads

    stats = pads.dataset(part_dir).to_table(
        columns=["chars", "n_spans", "n_errors", "ocr_ms"]
    )
    ocr_ms = stats.column("ocr_ms").to_numpy()
    ocr_pos = ocr_ms[ocr_ms > 0]
    return {
        "docs": stats.num_rows,
        "spans_out": int(np.sum(stats.column("n_spans").to_numpy())),
        "chars": int(np.sum(stats.column("chars").to_numpy())),
        "errors": int(np.sum(stats.column("n_errors").to_numpy())),
        "ocr_latency_ms": {
            "p50": float(np.percentile(ocr_pos, 50)) if len(ocr_pos) else 0.0,
            "p95": float(np.percentile(ocr_pos, 95)) if len(ocr_pos) else 0.0,
            "count": int(len(ocr_pos)),
        },
    }


def _run_partition(
    pid: int,
    input_file: str,
    manifest: Manifest,
    *,
    plan: str,
    ocr_burn: int,
    ocr_latency_ms: float,
    ocr_batch_size: int,
    ocr_concurrency,
    policy,
) -> dict:
    ds = read_documents_files([input_file])
    if plan == "fused":
        out = fused_pipeline(
            ds, ocr_burn=ocr_burn, ocr_latency_ms=ocr_latency_ms,
            concurrency=ocr_concurrency, policy=policy, with_stats=True
        )
    else:
        out = extract_pipeline(
            ds,
            ocr_burn=ocr_burn,
            ocr_latency_ms=ocr_latency_ms,
            ocr_batch_size=ocr_batch_size,
            ocr_concurrency=ocr_concurrency,
            policy=policy,
            with_stats=True,
        )
    part_dir = manifest.part_dir(pid)
    tmp_dir = os.path.join(manifest.output_dir, f"_tmp-part-{pid:05d}")
    for stale in (tmp_dir, part_dir):
        if os.path.isdir(stale):
            shutil.rmtree(stale)  # uncommitted leftovers from a killed run
    write_extracted(out, tmp_dir)
    os.replace(tmp_dir, part_dir)
    record = {
        "input_file": os.path.abspath(input_file),
        "input_fingerprint": partition_fingerprint(input_file),
        "plan": plan,
        **_partition_metrics(part_dir),
    }
    manifest.commit(pid, record)
    return record


def run_extract(
    input_path: str,
    output_dir: str,
    *,
    plan: str = "canonical",
    ocr_burn: int = 0,
    ocr_latency_ms: float = 0.0,
    ocr_batch_size: int = 512,
    ocr_concurrency=(1, 8),
    policy="text",
    wave: int = 4,
    max_partitions: int | None = None,
) -> dict:
    """Run (or resume) extraction over all partitions of ``input_path``.

    Returns a summary: partitions done/skipped and aggregate metrics.
    ``max_partitions`` bounds how many pending partitions run (the
    kill-simulation hook for resume tests).
    """
    files = list_input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no input data files under {input_path}")
    os.makedirs(output_dir, exist_ok=True)
    manifest = Manifest(output_dir)
    pending: list[tuple[int, str]] = []
    skipped = 0
    for pid, f in enumerate(files):
        if manifest.is_done(pid, partition_fingerprint(f)):
            skipped += 1
        else:
            pending.append((pid, f))
    if max_partitions is not None:
        pending = pending[:max_partitions]
    if plan == "auto":
        from ..pipelines.extract import choose_plan

        probe = read_documents_files([files[0]])
        plan = choose_plan(probe, ocr_burn=ocr_burn,
                           ocr_latency_ms=ocr_latency_ms)
    kwargs = dict(
        plan=plan,
        ocr_burn=ocr_burn,
        ocr_latency_ms=ocr_latency_ms,
        ocr_batch_size=ocr_batch_size,
        ocr_concurrency=ocr_concurrency,
        policy=policy,
    )
    done = []
    if pending:
        with ThreadPoolExecutor(max_workers=max(1, wave)) as pool:
            futs = [
                pool.submit(_run_partition, pid, f, manifest, **kwargs)
                for pid, f in pending
            ]
            done = [f.result() for f in futs]
    return {
        "partitions_total": len(files),
        "partitions_skipped": skipped,
        "partitions_run": len(done),
        "docs": sum(r["docs"] for r in done),
        "spans_out": sum(r["spans_out"] for r in done),
        "errors": sum(r["errors"] for r in done),
        "plan": plan,
        "output_dir": output_dir,
    }
