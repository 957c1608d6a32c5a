"""Resumable partitioned runners (extract, prep, curate).

Partition unit = one input data file of the documents table; every
partition commits atomically (output → ``_tmp`` dir → rename →
manifest record) and a killed run resumes by fingerprint-matching the
manifest, redoing only missing partitions (SURVEY.md §4.3).

Two execution shapes, chosen by what the per-partition work needs:

- **extract** (``run_extract``): each partition runs the extraction
  pipeline as its own internally-parallel Dataset execution (actor
  pools, salted splits, reassembly exchange); ``wave`` partitions run
  concurrently so the cluster stays saturated.
- **prep / curate annotate** (``_run_two_phase``): the per-partition
  work is a map-only pass whose parallelism unit IS the partition, so
  each runs as ONE plain Ray task (streaming parquet read inside the
  task) — per-partition Dataset executors measurably anti-scale on
  many-small-file inputs (BASELINE.md r3 'annotate phase').
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..pipelines.extract import extract_pipeline, fused_pipeline
from ..sources.io import (list_input_files, read_documents,
                          read_documents_files, write_extracted)
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


def _partition_csv_path(output_dir: str, pid: int) -> str:
    return os.path.join(output_dir, "summary", f"part-{pid:05d}.csv")


def _ensure_partition_csv(manifest, pid: int) -> None:
    """Write the reference-format summary csv for one COMMITTED
    partition if missing — projected from the written stats columns
    (no pipeline re-execution), atomic and idempotent.  Recommits
    unlink the old part first (see _run_partition), so 'missing'
    always means 'needs (re)generation'."""
    import pyarrow.dataset as pads

    from ..pipelines.extract import compat_summary_rows, write_csv_table

    csv_path = _partition_csv_path(manifest.output_dir, pid)
    if os.path.exists(csv_path):
        return
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    rows = compat_summary_rows(
        pads.dataset(manifest.part_dir(pid)).to_table(
            columns=["doc_id", "engine", "chars", "n_spans"])
    ).sort_by("file")
    write_csv_table(rows, csv_path)


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
    model=None,
    metrics_sink=None,
) -> dict:
    ds = read_documents_files([input_file])
    if plan == "fused":
        out = fused_pipeline(
            ds, ocr_burn=ocr_burn, ocr_latency_ms=ocr_latency_ms,
            concurrency=ocr_concurrency, policy=policy, with_stats=True,
            model=model, metrics_sink=metrics_sink, metrics_tag=pid,
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
            model=model,
            metrics_sink=metrics_sink,
            metrics_tag=pid,
        )
    part_dir = manifest.part_dir(pid)
    tmp_dir = os.path.join(manifest.output_dir, f"_tmp-part-{pid:05d}")
    for stale in (tmp_dir, part_dir):
        if os.path.isdir(stale):
            shutil.rmtree(stale)  # uncommitted leftovers from a killed run
    write_extracted(out, tmp_dir)
    os.replace(tmp_dir, part_dir)
    # a recommitted partition invalidates any previous summary csv;
    # drop it so a non-csv run never leaves a stale part claiming to
    # summarize the new data (the csv_summary path rewrites it below
    # via _ensure_partition_csv in run_extract)
    stale_csv = _partition_csv_path(manifest.output_dir, pid)
    if os.path.exists(stale_csv):
        os.remove(stale_csv)
    record = {
        "input_file": os.path.abspath(input_file),
        "input_fingerprint": partition_fingerprint(input_file),
        "plan": plan,
        **_partition_metrics(part_dir),
    }
    if metrics_sink is not None:
        # drain THIS partition's actor resource samples (the write +
        # metrics read above give in-flight fire-and-forget pushes time
        # to land; a straggler sample is dropped, never misattributed).
        # Telemetry must never fail the job: a dead/unreachable sink
        # degrades the record, not the commit.
        import ray

        from .metrics import aggregate_samples

        try:
            record["resources"] = aggregate_samples(
                ray.get(metrics_sink.drain.remote(pid), timeout=30)
            )
        except Exception as e:  # noqa: BLE001 - telemetry only
            record["resources"] = {"samples": 0,
                                   "error": f"sink unavailable: {e}"}
    manifest.commit(pid, record)
    return record


def _annotate_file_task(input_file: str, tmp_dir: str, make_annotator,
                        batch_rows: int = 16384) -> int:
    """Annotate+gate ONE input file inside a single Ray TASK.

    Deliberately NOT a Ray Data pipeline: a per-file streaming executor
    costs ~0.4-0.5 s of fixed setup/dispatch, and — measured on this
    host — that cost GROWS with cluster size (200 small files at
    num_cpus=32 ran 2x SLOWER than at 8 through per-file Datasets,
    while one task per file scales linearly; BASELINE.md r3 'annotate
    phase' note).  The partition is already the parallelism unit, the
    stage is map-only, and ``ParquetFile.iter_batches`` bounds memory
    to one batch — the Dataset machinery buys nothing here.  This is
    the sanctioned raw-task escape hatch: a per-file commit unit the
    Dataset API cannot express without paying per-file executors.

    SHARED-FS REQUIREMENT (ADVICE r3): the task writes ``tmp_dir`` on
    the worker while the DRIVER performs the ``os.replace`` commit, so
    both must see one filesystem.  True in this sandbox (single node)
    and on any cluster whose checkpoint dir is shared storage (NFS,
    FSx, blob-mount) — which a 100-TB output dir is in practice.  On
    node-local disks, swap the write for the storage abstraction in
    ``sources.io`` (fsspec-style URI) so tmp + rename target the same
    remote store; the commit protocol itself is unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ann = make_annotator()
    os.makedirs(tmp_dir, exist_ok=True)
    out_path = os.path.join(tmp_dir, "part-0.parquet")
    pf = pq.ParquetFile(input_file)
    writer = None
    kept = 0
    try:
        for rb in pf.iter_batches(batch_size=batch_rows,
                                  columns=["doc_id", "text"]):
            t = ann(pa.Table.from_batches([rb]))
            if writer is None:
                writer = pq.ParquetWriter(out_path, t.schema)
            writer.write_table(t)
            kept += t.num_rows
        if writer is None:  # empty input file: still commit the schema
            t = ann(pa.table({"doc_id": pa.array([], type=pa.int64()),
                              "text": pa.array([], type=pa.string())}))
            writer = pq.ParquetWriter(out_path, t.schema)
            writer.write_table(t)
    finally:
        if writer is not None:
            writer.close()
    return kept


def _run_two_phase(
    job: str,
    input_path: str,
    output_dir: str,
    *,
    make_annotator,
    annotate_sig: str,
    build_finalize,
    finalize_sig: str,
    write_kwargs: dict | None = None,
    record_extra: dict | None = None,
    wave: int = 4,
    max_partitions: int | None = None,
) -> dict:
    """Generic resumable two-phase export (VERDICT r2 #6 — the
    reference reruns everything on a crash, ``ollama_cloud_ocr.py:889``;
    a 100-TB export must not):

    1. **Annotate** (resumable, partition = input file):
       ``make_annotator()`` maps each document block to its scalar
       annotation rows, text dropped at the stage boundary.  Each
       partition commits atomically (tmp → rename → manifest record)
       under ``output_dir/annotated``; a rerun fingerprint-matches and
       redoes only missing partitions.  ``annotate_sig`` folds the
       gate/annotate config into the partition fingerprint, so a config
       change redoes the annotate pass.
    2. **Finalize** (global, cheap): ``build_finalize(ann_ds)`` runs the
       cross-partition step (dedup / sample / shuffle) over the
       committed annotations — scalar columns only, no text — written
       atomically to ``output_dir/data``.  The finalize record is keyed
       on the sorted partition fingerprints plus ``finalize_sig``, so
       input or export-config changes re-run only this pass.

    A kill anywhere leaves either nothing or a committed unit; resume
    cost is bounded by one partition plus the finalize pass.
    ``max_partitions`` bounds phase-1 work (the kill-simulation hook);
    when partitions remain pending the summary reports
    ``status="partial"`` and finalize is skipped.  ``wave`` is accepted
    for CLI compatibility but unused: annotate partitions run as plain
    Ray tasks, so Ray schedules parallelism = cluster CPUs directly.
    """
    import hashlib
    import json

    files = list_input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no input data files under {input_path}")
    ann_dir = os.path.join(output_dir, "annotated")
    os.makedirs(ann_dir, exist_ok=True)
    manifest = Manifest(ann_dir)
    fps = {
        pid: f"{partition_fingerprint(f)}:{annotate_sig}"
        for pid, f in enumerate(files)
    }
    pending = [
        (pid, f) for pid, f in enumerate(files)
        if not manifest.is_done(pid, fps[pid])
    ]
    skipped = len(files) - len(pending)
    if max_partitions is not None:
        pending = pending[:max_partitions]
    if pending:
        # one Ray task per partition (see _annotate_file_task for why
        # not per-file Datasets); Ray schedules parallelism = cluster
        # CPUs, so no wave/thread machinery is needed.  The tmp-write →
        # rename → manifest commit happens DRIVER-side on completion,
        # keeping the manifest single-writer and the crash window
        # identical to the extract runner's.
        import ray

        task = ray.remote(num_cpus=1)(_annotate_file_task)
        refs = {}
        for pid, f in pending:
            part_dir = manifest.part_dir(pid)
            tmp_dir = os.path.join(manifest.output_dir,
                                   f"_tmp-part-{pid:05d}")
            for stale in (tmp_dir, part_dir):
                if os.path.isdir(stale):
                    shutil.rmtree(stale)  # leftovers from a killed run
            refs[task.remote(f, tmp_dir, make_annotator)] = (pid, f)
        failures = []
        while refs:
            # drain every ready task per round (one wait RTT per task
            # serialized the commit loop on 200-tiny-file inputs)
            done_refs, _ = ray.wait(
                list(refs), num_returns=min(len(refs), 64), timeout=1.0
            )
            for ref in done_refs:
                pid, f = refs.pop(ref)
                try:
                    kept = ray.get(ref)
                except Exception as e:  # noqa: BLE001 - commit the rest
                    # one corrupt file must not discard the other
                    # partitions' finished work: keep draining and
                    # committing, report all failures at the end (the
                    # committed partitions are skipped on the rerun)
                    failures.append((f, e))
                    continue
                tmp_dir = os.path.join(manifest.output_dir,
                                       f"_tmp-part-{pid:05d}")
                os.replace(tmp_dir, manifest.part_dir(pid))
                manifest.commit(pid, {
                    "input_file": os.path.abspath(f),
                    "input_fingerprint": fps[pid],
                    "docs_kept": kept,
                    **(record_extra or {}),
                })
        if failures:
            raise RuntimeError(
                f"{len(failures)} annotate partition(s) failed "
                f"(others committed; rerun resumes): "
                + "; ".join(f"{f}: {e}" for f, e in failures[:5])
            )
    summary = {
        "job": job,
        "partitions_total": len(files),
        "partitions_skipped": skipped,
        "partitions_run": len(pending),
        "output": output_dir,
        "data_dir": os.path.join(output_dir, "data"),
    }
    if any(not manifest.is_done(pid, fps[pid]) for pid in fps):
        return {**summary, "status": "partial", "rows_kept": None}

    # --- finalize: the global pass over the committed annotations ----
    finalize_key = hashlib.sha256(
        json.dumps(
            [fps[pid] for pid in sorted(fps)] + [finalize_sig]
        ).encode()
    ).hexdigest()[:16]
    final_rec_path = os.path.join(output_dir, "final.json")
    data_dir = summary["data_dir"]
    try:
        with open(final_rec_path) as f:
            final_rec = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        final_rec = None
    if (
        final_rec is not None
        and final_rec.get("finalize_key") == finalize_key
        and os.path.isdir(data_dir)
    ):
        return {**summary, "status": "done",
                "rows_kept": final_rec["rows_kept"], "finalized": False}

    import ray.data as rd

    part_files = [
        os.path.join(d, f)
        for d in (manifest.part_dir(pid) for pid in sorted(fps))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    out = build_finalize(rd.read_parquet(part_files))
    tmp_data = os.path.join(output_dir, "_tmp-data")
    for stale in (tmp_data, data_dir):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    out.write_parquet(tmp_data, **(write_kwargs or {}))
    # a 0-row write (every document gated away) creates no directory;
    # commit an empty one so resume/read see a valid finalized export
    os.makedirs(tmp_data, exist_ok=True)
    os.replace(tmp_data, data_dir)
    import pyarrow.dataset as pads

    rows_kept = pads.dataset(data_dir, partitioning="hive").count_rows()
    tmp_rec = final_rec_path + ".tmp"
    with open(tmp_rec, "w") as f:
        json.dump({"finalize_key": finalize_key, "rows_kept": rows_kept,
                   "status": "done"}, f, indent=1)
    os.replace(tmp_rec, final_rec_path)
    return {**summary, "status": "done", "rows_kept": rows_kept,
            "finalized": True}


def run_prep(
    input_path: str,
    output_dir: str,
    *,
    quality_threshold: float = 0.01,
    wave: int = 4,
    max_partitions: int | None = None,
    shuffle_seed: int | None = None,
    partition_by: str | None = None,
) -> dict:
    """Run (or resume) the corpus-prep export: quality-gated annotate
    partitions, then the global exact-dedup keep-min-doc_id (+ optional
    seeded shuffle).  See ``_run_two_phase`` for the checkpoint
    protocol."""
    from ..functions.prep import ANNOTATE_SCHEMA, PrepAnnotate, dedup_keep_min

    def build_finalize(ann):
        out = dedup_keep_min(ann, empty_schema=ANNOTATE_SCHEMA)
        if shuffle_seed is not None:
            out = out.random_shuffle(seed=shuffle_seed)
        return out

    return _run_two_phase(
        "prep", input_path, output_dir,
        make_annotator=lambda: PrepAnnotate(quality_threshold),
        annotate_sig=f"q={quality_threshold!r}",
        build_finalize=build_finalize,
        finalize_sig=f"shuffle={shuffle_seed!r}:part={partition_by!r}",
        write_kwargs={"partition_cols": [partition_by]}
        if partition_by else None,
        record_extra={"quality_threshold": quality_threshold},
        wave=wave,
        max_partitions=max_partitions,
    )


def run_curate(
    input_path: str,
    output_dir: str,
    *,
    quality_threshold: float = 0.01,
    max_top2gram_e4: int = 800,
    sample_k: int = 20,
    sample_seed: int = 0,
    fan_in: int = 64,
    wave: int = 4,
    max_partitions: int | None = None,
) -> dict:
    """Run (or resume) the training-mix curation export: quality +
    phrase-repetition gated annotate partitions, then the global
    exact-dedup + seeded stratified sample per predicted language.
    Same checkpoint protocol as ``run_prep`` (``_run_two_phase``)."""
    from ..functions.prep import ANNOTATE_SCHEMA, CurateAnnotate, dedup_keep_min
    from ..functions.sampling import sample_stratified

    def build_finalize(ann):
        return sample_stratified(dedup_keep_min(ann,
                                                empty_schema=ANNOTATE_SCHEMA),
                                 stratum_col="pred_lang",
                                 k=sample_k, seed=sample_seed,
                                 fan_in=fan_in)

    return _run_two_phase(
        "curate", input_path, output_dir,
        make_annotator=lambda: CurateAnnotate(quality_threshold,
                                              max_top2gram_e4),
        annotate_sig=f"q={quality_threshold!r}:rep={max_top2gram_e4}",
        build_finalize=build_finalize,
        finalize_sig=f"k={sample_k}:seed={sample_seed}",
        record_extra={"quality_threshold": quality_threshold,
                      "max_top2gram_e4": max_top2gram_e4},
        wave=wave,
        max_partitions=max_partitions,
    )


def _pack_shard_task(shard_dir: str, tmp_dir: str, capacity: int,
                     batch_rows: int = 8192) -> dict:
    """Pack ONE selected shard inside a single Ray task: stream the
    shard's (doc_id, text) rows, run next-fit-decreasing packing +
    concatenation per ``batch_rows``-row unit (``packed_examples_block``),
    write one parquet.  The select phase writes one file per exchange
    block — often tiny (11-row files observed at 1M-doc volume) — so
    rows are COALESCED across files/row-groups up to ``batch_rows``
    before packing; packing tiny units one-per-file leaves packs ~25%
    full.  Pack-id uniqueness holds across units and shards because
    both partition the doc_id space (units are disjoint doc sets, so
    their min-doc_id prefixes differ).  Same raw-task escape hatch and
    SHARED-FS requirement as ``_annotate_file_task``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.packing import packed_examples_block

    os.makedirs(tmp_dir, exist_ok=True)
    out_path = os.path.join(tmp_dir, "part-0.parquet")
    files = (
        sorted(
            os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
            if f.endswith(".parquet")
        )
        if os.path.isdir(shard_dir) else []
    )
    writer = None
    n_docs = n_packs = n_tokens = 0
    pending: list = []
    pending_rows = 0

    def _flush():
        nonlocal writer, n_docs, n_packs, n_tokens, pending, pending_rows
        t = packed_examples_block(
            pa.Table.from_batches(pending).combine_chunks(),
            capacity=capacity,
        )
        pending, pending_rows = [], 0
        if writer is None:
            writer = pq.ParquetWriter(out_path, t.schema)
        writer.write_table(t)
        n_packs += t.num_rows
        n_docs += int(np.sum(t.column("n_docs").to_numpy()))
        n_tokens += int(np.sum(t.column("n_tokens").to_numpy()))

    try:
        for path in files:
            pf = pq.ParquetFile(path)
            for rb in pf.iter_batches(batch_size=batch_rows,
                                      columns=["doc_id", "text"]):
                if rb.num_rows == 0:
                    continue
                pending.append(rb)
                pending_rows += rb.num_rows
                if pending_rows >= batch_rows:
                    _flush()
        if pending:
            _flush()
        if writer is None:  # empty shard: still commit the schema
            t = packed_examples_block(
                pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "text": pa.array([], type=pa.string())}),
                capacity=capacity,
            )
            writer = pq.ParquetWriter(out_path, t.schema)
            writer.write_table(t)
    finally:
        if writer is not None:
            writer.close()
    return {"docs": n_docs, "packs": n_packs, "tokens": n_tokens}


def run_export(
    input_path: str,
    output_dir: str,
    *,
    manifest_path: str,
    capacity: int = 2048,
    n_shards: int = 16,
    max_partitions: int | None = None,
) -> dict:
    """Resumable packed-corpus export (VERDICT r3 missing #3): join a
    mix manifest (``doc_id`` rows from a prep/curate export) back to
    document TEXT and write actual training examples — one row per
    pack, documents concatenated in next-fit-decreasing order.

    Phase 1 **select** (global, the one exchange): the manifest's
    doc_ids co-partition with the corpus via ``relational.hash_join``
    (the manifest may be corpus-sized — never a driver-side id set);
    each selected doc gets a deterministic shard (``doc_id %
    n_shards``) and the joined rows commit ATOMICALLY as a whole
    (tmp → rename + ``select.json`` keyed on input + manifest
    fingerprints + shard count).  A matching key skips the join on
    rerun.

    Phase 2 **pack** (per-shard, resumable): each shard packs in one
    Ray task and commits through the standard partition manifest, its
    fingerprint embedding the select key + capacity — so a new
    selection or capacity change redoes the packing, a killed run
    redoes only missing shards.  ``max_partitions`` bounds phase-2
    shards per run (the kill-simulation hook).
    """
    import hashlib
    import json as _json

    import ray
    import ray.data as rd

    files = list_input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no input data files under {input_path}")
    man_files = list_input_files(manifest_path)
    if not man_files:
        raise FileNotFoundError(
            f"no mix-manifest parquet under {manifest_path}"
        )
    os.makedirs(output_dir, exist_ok=True)
    select_key = hashlib.sha256(
        _json.dumps(
            [partition_fingerprint(f) for f in files]
            + [partition_fingerprint(f) for f in man_files]
            + [f"shards={n_shards}"]
        ).encode()
    ).hexdigest()[:16]
    selected_dir = os.path.join(output_dir, "selected")
    sel_rec_path = os.path.join(output_dir, "select.json")
    try:
        with open(sel_rec_path) as f:
            sel_rec = _json.load(f)
    except (FileNotFoundError, _json.JSONDecodeError):
        sel_rec = None
    selected_fresh = False
    if not (
        sel_rec is not None
        and sel_rec.get("select_key") == select_key
        and os.path.isdir(selected_dir)
    ):
        from ..functions.relational import hash_join

        import pyarrow as pa

        docs = rd.read_parquet(files, columns=["doc_id", "text"])
        mix = rd.read_parquet(man_files, columns=["doc_id"])
        joined = hash_join(mix, docs, key="doc_id", left_cols=[],
                           right_cols=["text"])

        def add_shard(batch: pa.Table) -> pa.Table:
            batch = batch.combine_chunks()
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "shard", pa.array((ids % n_shards).astype(np.int64))
            )

        out = joined.map_batches(add_shard, batch_format="pyarrow",
                                 zero_copy_batch=True)
        tmp_sel = os.path.join(output_dir, "_tmp-selected")
        for stale in (tmp_sel, selected_dir):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        out.write_parquet(tmp_sel, partition_cols=["shard"])
        os.replace(tmp_sel, selected_dir)
        tmp_rec = sel_rec_path + ".tmp"
        with open(tmp_rec, "w") as f:
            _json.dump({"select_key": select_key, "n_shards": n_shards}, f,
                       indent=1)
        os.replace(tmp_rec, sel_rec_path)
        selected_fresh = True

    data_dir = os.path.join(output_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    manifest = Manifest(data_dir)

    def shard_fp(k: int) -> str:
        return f"{select_key}:cap={capacity}:shard={k}"

    pending = [
        k for k in range(n_shards) if not manifest.is_done(k, shard_fp(k))
    ]
    skipped = n_shards - len(pending)
    if max_partitions is not None:
        pending = pending[:max_partitions]
    if pending:
        task = ray.remote(num_cpus=1)(_pack_shard_task)
        refs = {}
        for k in pending:
            part_dir = manifest.part_dir(k)
            tmp_dir = os.path.join(manifest.output_dir,
                                   f"_tmp-part-{k:05d}")
            for stale in (tmp_dir, part_dir):
                if os.path.isdir(stale):
                    shutil.rmtree(stale)
            shard_dir = os.path.join(selected_dir, f"shard={k}")
            refs[task.remote(shard_dir, tmp_dir, capacity)] = k
        while refs:
            done_refs, _ = ray.wait(
                list(refs), num_returns=min(len(refs), 64), timeout=1.0
            )
            for ref in done_refs:
                k = refs.pop(ref)
                stats = ray.get(ref)
                tmp_dir = os.path.join(manifest.output_dir,
                                       f"_tmp-part-{k:05d}")
                os.replace(tmp_dir, manifest.part_dir(k))
                manifest.commit(k, {
                    "input_fingerprint": shard_fp(k),
                    "capacity": capacity,
                    **stats,
                })
    summary = {
        "job": "export",
        "shards_total": n_shards,
        "shards_skipped": skipped,
        "shards_run": len(pending),
        "selected_fresh": selected_fresh,
        "output": output_dir,
        "data_dir": data_dir,
    }
    if any(not manifest.is_done(k, shard_fp(k)) for k in range(n_shards)):
        return {**summary, "status": "partial"}
    # totals over THIS selection's shards only (a stale record from an
    # older, larger shard count must not leak into the sums)
    recs = [manifest.record(k) for k in range(n_shards)]
    return {
        **summary,
        "status": "done",
        "docs": sum(r.get("docs", 0) for r in recs),
        "packs": sum(r.get("packs", 0) for r in recs),
        "tokens": sum(r.get("tokens", 0) for r in recs),
    }


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
    model=None,
    wave: int = 4,
    max_partitions: int | None = None,
    csv_summary: bool = False,
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
    # one zero-CPU metrics sink per job: every OCR actor pushes one
    # resource sample per batch, drained per partition at commit
    from .metrics import make_sink

    metrics_sink = make_sink() if pending else None
    kwargs = dict(
        plan=plan,
        ocr_burn=ocr_burn,
        ocr_latency_ms=ocr_latency_ms,
        ocr_batch_size=ocr_batch_size,
        ocr_concurrency=ocr_concurrency,
        policy=policy,
        model=model,
        metrics_sink=metrics_sink,
    )
    done = []
    if pending:
        with ThreadPoolExecutor(max_workers=max(1, wave)) as pool:
            futs = [
                pool.submit(_run_partition, pid, f, manifest, **kwargs)
                for pid, f in pending
            ]
            done = [f.result() for f in futs]
    if csv_summary:
        # reference-format CSVs (K3 compat, ocr_router.py:378-386):
        # AFTER the partition loop so a resumed run also fills parts
        # for partitions committed by an earlier non-csv run — the
        # summary dir always covers exactly the committed partitions
        for pid, f in enumerate(files):
            if manifest.is_done(pid, partition_fingerprint(f)):
                _ensure_partition_csv(manifest, pid)
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


def run_ingest(input_path: str, output_dir: str, *,
               index_path: str | None = None, n_shards: int = 8,
               mode: str = "exact", threshold: float = 0.7,
               hot_bucket_cap: int = 4096) -> dict:
    """Resumable incremental-ingest job: dedup ``input_path`` against
    (and into) a persistent index (``state/dedup_index.py``), write the
    surviving rows, and snapshot the grown index for the NEXT epoch —
    the daily-shards-vs-exported-history workflow the batch dedup
    exchange can't serve.  ``mode='exact'`` uses the content-hash
    index; ``mode='near'`` uses the LSH signature index at the given
    estimated-Jaccard ``threshold`` — both accept flat text corpora
    AND the interleaved shape (near mode shingles the canonical
    ``render_spans_text`` rendering).

    Layout: ``data/`` (kept rows), ``index/`` (the new sealed
    snapshot), ``ingest.json`` (completion key, written last).  Crash
    anywhere → rerun with the same arguments: offers are idempotent,
    the filter pass is deterministic (global min doc_id wins), the
    data dir is rebuilt from scratch if its completion key is missing,
    and an already-saved snapshot is reused as-is (same determinism).
    ``index_path`` is the previous epoch's snapshot (omit for epoch 0);
    its pinned shard fan-out and MinHash parameters win over the
    arguments here.
    """
    import json

    from .dedup_index import (DedupIndex, NearDupIndex,
                              _load_snapshot_meta, ingest_dedup,
                              ingest_neardup, render_spans_text)

    if mode not in ("exact", "near"):
        raise ValueError(f"run_ingest: unknown mode {mode!r} "
                         "(expected 'exact' or 'near')")

    done_key = os.path.join(output_dir, "ingest.json")
    if os.path.exists(done_key):
        with open(done_key) as f:
            return json.load(f)  # resume: epoch already complete
    os.makedirs(output_dir, exist_ok=True)
    data_dir = os.path.join(output_dir, "data")
    index_dir = os.path.join(output_dir, "index")

    # the exact index accepts BOTH corpus shapes (interleaved spans or
    # flat text); the interleaved schema validator only applies to the
    # former, so probe the schema first
    docs = read_documents(input_path, validate=False)
    names = docs.schema().names
    if "spans" in names:
        docs = read_documents(input_path, validate=True)
    keep_cols = [c for c in names]
    stats: dict = {}
    if mode == "near":
        if "text" not in names:
            if "spans" not in names:
                raise ValueError(
                    "--dedup near needs a 'text' or 'spans' column; "
                    f"got columns {sorted(names)}"
                )
            # interleaved corpus: shingle the canonical rendering
            # (render_spans_text is snapshot-format-bearing — it lives
            # in dedup_index beside the signature fold)
            import pyarrow as pa

            def render(batch: pa.Table) -> pa.Table:
                texts = [render_spans_text(spans)
                         for spans in batch.column("spans").to_pylist()]
                return batch.append_column(
                    "text", pa.array(texts, type=pa.string()))

            docs = docs.map_batches(render, batch_format="pyarrow")
        index = (NearDupIndex.load(index_path) if index_path
                 else NearDupIndex(n_shards=n_shards))
        kept = ingest_neardup(docs, index, threshold=threshold,
                              keep_cols=keep_cols, stats=stats,
                              hot_bucket_cap=hot_bucket_cap)
    else:
        index = (DedupIndex.load(index_path) if index_path
                 else DedupIndex(n_shards=n_shards))
        kept = ingest_dedup(docs, index, keep_cols=keep_cols,
                            stats=stats)

    tmp = data_dir + "_tmp"
    for d in (tmp, data_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)  # deterministic rebuild after a crash
    os.makedirs(tmp)  # an all-duplicates epoch writes ZERO files —
    # the dir must exist for the rename and stay valid when empty
    kept.write_parquet(tmp)
    os.replace(tmp, data_dir)
    n_input = stats["n_input"]

    if os.path.isdir(index_dir):
        # crash landed between snapshot and completion key: the saved
        # snapshot is identical by determinism — reuse it, but only if
        # it is the SAME dedup kind (a crashed near run rerun as exact
        # would otherwise pair exact data with a near-dup index)
        meta = _load_snapshot_meta(
            index_dir, "neardup" if mode == "near" else "exact")
        n_entries = meta["entries"]
    else:
        n_entries = index.save(index_dir)

    import pyarrow.parquet as pq

    parts = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    n_kept = (pq.read_table(data_dir, columns=["doc_id"]).num_rows
              if parts else 0)
    summary = {
        "job": "ingest",
        "mode": mode,
        "input_docs": int(n_input),
        "kept": int(n_kept),
        "dropped": int(n_input - n_kept),
        "index_entries": int(n_entries),
        "index_dir": index_dir,
    }
    # near-mode phase timings + the hot-bucket saturation diagnostic
    for k in ("t_offer_s", "t_decide_s", "n_saturated_bucket_probes"):
        if k in stats:
            summary[k] = stats[k]
    tmp_key = done_key + ".tmp"
    with open(tmp_key, "w") as f:
        json.dump(summary, f)
    os.replace(tmp_key, done_key)
    return summary
