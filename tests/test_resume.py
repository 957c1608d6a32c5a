"""Checkpoint/resume tests (SURVEY.md §5.2.3): kill after a partition
subset → rerun → identical final output, finished partitions untouched."""

import os

import pyarrow.dataset as pads
import pytest

from ollama_ocr_ray import oracle, synth
from ollama_ocr_ray.state.manifest import Manifest, partition_fingerprint
from ollama_ocr_ray.state.runner import run_extract


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    # write_corpus shards into multiple parquet files (partitions)
    root = tmp_path_factory.mktemp("resume")
    return synth.write_corpus(str(root), 200, seed=11)


def _read_spans(output_dir):
    files = [
        os.path.join(output_dir, d, f)
        for d in sorted(os.listdir(output_dir))
        if d.startswith("part-")
        for f in sorted(os.listdir(os.path.join(output_dir, d)))
    ]
    t = pads.dataset(files).to_table(columns=["doc_id", "spans"])
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]
        ]
        for r in t.to_pylist()
    }


def test_partial_run_then_resume(ray_session, corpus_dir, tmp_path):
    out = str(tmp_path / "out")
    # "killed" run: only 2 partitions complete
    s1 = run_extract(corpus_dir, out, max_partitions=2, wave=2, ocr_concurrency=1)
    assert s1["partitions_run"] == 2 and s1["partitions_skipped"] == 0
    m = Manifest(out)
    assert len(m.records()) == 2
    mtimes = {
        pid: os.stat(m.part_dir(pid)).st_mtime_ns for pid in (0, 1)
    }

    # resume: finishes the rest, leaves done partitions untouched
    s2 = run_extract(corpus_dir, out, wave=2, ocr_concurrency=1)
    assert s2["partitions_skipped"] == 2
    assert s2["partitions_run"] == s2["partitions_total"] - 2
    for pid, mt in mtimes.items():
        assert os.stat(m.part_dir(pid)).st_mtime_ns == mt, "done partition rewritten"

    # final output equals the oracle over the whole corpus
    expected = oracle.extract_corpus(
        synth.gen_table(200, seed=11)
    )
    assert _read_spans(out) == expected

    # idempotent: a third run does nothing
    s3 = run_extract(corpus_dir, out, ocr_concurrency=1)
    assert s3["partitions_run"] == 0


def test_fingerprint_invalidation(ray_session, corpus_dir, tmp_path):
    out = str(tmp_path / "out2")
    run_extract(corpus_dir, out, max_partitions=1, ocr_concurrency=1)
    m = Manifest(out)
    rec = m.record(0)
    assert rec["status"] == "done"
    assert rec["docs"] > 0 and rec["spans_out"] > 0
    assert "ocr_latency_ms" in rec
    # touch the input file → fingerprint changes → partition redone
    f0 = rec["input_file"]
    os.utime(f0)
    assert not m.is_done(0, partition_fingerprint(f0))
    s = run_extract(corpus_dir, out, max_partitions=1, ocr_concurrency=1)
    assert s["partitions_run"] == 1


def test_fused_plan_runner(ray_session, corpus_dir, tmp_path):
    out = str(tmp_path / "fused")
    s = run_extract(corpus_dir, out, plan="fused", wave=2, ocr_concurrency=1)
    assert s["partitions_run"] == s["partitions_total"]
    expected = oracle.extract_corpus(synth.gen_table(200, seed=11))
    assert _read_spans(out) == expected


def test_cli_prep_job(ray_session, tmp_path, capsys):
    """--job prep streams the composed prep pipeline to partitioned
    parquet; kept rows = the library pipeline's own output."""
    import json

    import ray.data as rd

    from ollama_ocr_ray.functions.prep import prep_corpus
    from ollama_ocr_ray.run import main

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "prep")
    assert main(["--input", src, "--output", out, "--job", "prep"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    direct = prep_corpus(rd.read_parquet(src)).count()
    assert summary["rows_kept"] == direct > 0
    assert rd.read_parquet(out).count() == direct
    # re-running into the non-empty dir must fail fast (a silent
    # write_parquet would MERGE with the first run's files)...
    with pytest.raises(SystemExit, match="non-empty"):
        main(["--input", src, "--output", out, "--job", "prep"])
    # ...and --overwrite replaces rather than merges
    assert main(["--input", src, "--output", out, "--job", "prep",
                 "--overwrite"]) == 0
    assert rd.read_parquet(out).count() == direct
