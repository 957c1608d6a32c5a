"""End-to-end span-sequence equality of the Ray pipelines vs the
sequential oracle (SURVEY.md §5.2.2-4): canonical salted-split plan,
zero-shuffle fused plan, skew behavior, and structural invariants."""

import pyarrow.compute as pc
import pytest
import ray.data as rd

from ollama_ocr_ray import oracle, synth
from ollama_ocr_ray.pipelines.extract import (
    extract_pipeline,
    fused_pipeline,
    summary_table,
)
from ollama_ocr_ray.stages.explode import explode_batch
from ollama_ocr_ray.stages.extract import extract_batch
from ollama_ocr_ray.stages.ocr import OcrModel

N_DOCS = 300
SEED = 42


def _collect(ds):
    import pyarrow as pa

    tables = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    return pa.concat_tables(tables)


def _spans_map(table):
    out = {}
    for r in table.to_pylist():
        out[r["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]
        ]
    return out


@pytest.fixture(scope="module")
def corpus():
    return synth.gen_table(N_DOCS, seed=SEED)


@pytest.fixture(scope="module")
def expected(corpus):
    return oracle.extract_corpus(corpus)


def test_canonical_pipeline_matches_oracle(ray_session, corpus, expected):
    ds = rd.from_arrow(corpus).repartition(8)
    out = extract_pipeline(ds, ocr_batch_size=64, ocr_concurrency=2)
    got = _spans_map(_collect(out))
    assert set(got) == set(expected)
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id], doc_id


def test_fused_pipeline_matches_oracle(ray_session, corpus, expected):
    ds = rd.from_arrow(corpus).repartition(8)
    out = fused_pipeline(ds, batch_size=32, concurrency=2)
    got = _spans_map(_collect(out))
    assert got == expected


def test_skew_salted_split_spreads_heavy_doc(ray_session, corpus, expected):
    """A media-heavy doc's spans must be OCR'd across >1 actor batch
    (the salted split) and still reassemble exactly."""
    heavy_ids = [
        r["doc_id"]
        for r in corpus.to_pylist()
        if sum(s["kind"] == "media" for s in r["spans"]) >= 200
    ]
    assert heavy_ids, "fixture must contain a heavy doc"
    ds = rd.from_arrow(corpus).repartition(8)
    spans = (
        ds.map_batches(explode_batch, batch_format="pyarrow")
        .map_batches(extract_batch, batch_format="pyarrow")
        .map_batches(
            OcrModel,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
            fn_constructor_kwargs={"stamp_batches": True},
        )
    )
    t = _collect(spans)
    for doc_id in heavy_ids:
        rows = t.filter(
            pc.and_(
                pc.equal(t.column("doc_id"), doc_id),
                pc.equal(t.column("kind"), "ocr"),
            )
        )
        stamps = set(rows.column("ocr_batch").to_pylist())
        assert len(stamps) > 1, f"{doc_id} OCR'd in a single batch"


def test_structural_invariants(ray_session, corpus, expected):
    """Property-style checks: no doc lost/duplicated; order dense and
    strictly increasing; media spans preserved 1:1."""
    ds = rd.from_arrow(corpus)
    out = _collect(extract_pipeline(ds))
    ids = out.column("doc_id").to_pylist()
    assert len(ids) == len(set(ids)) == N_DOCS
    for r in out.to_pylist():
        orders = [s["order"] for s in r["spans"]]
        assert orders == list(range(len(orders)))
    n_media_in = sum(
        sum(s["kind"] == "media" for s in r["spans"]) for r in corpus.to_pylist()
    )
    n_media_out = sum(
        sum(s["kind"] in ("ocr", "error") for s in r["spans"])
        for r in out.to_pylist()
    )
    assert n_media_in == n_media_out


def test_summary_table(ray_session, corpus, expected):
    ds = rd.from_arrow(corpus)
    stats = extract_pipeline(ds, with_stats=True)
    summ = _collect(summary_table(stats))
    assert len(summ) == N_DOCS
    by_id = {r["doc_id"]: r for r in summ.to_pylist()}
    for doc_id, spans in expected.items():
        row = by_id[doc_id]
        assert row["spans"] == len(spans)
        assert row["chars"] == sum(len(s[1]) for s in spans)
        assert row["errors"] == sum(1 for s in spans if s[0] == "error")
        assert row["engine"] == (spans[0][0] if spans else "")


def test_very_wide_doc_canonical(ray_session):
    """SURVEY §7.3: a single doc with 10k media spans must flow through
    the canonical plan without blowing a block — span-granular explode
    spreads it across batches/actors — and reassemble exactly."""
    import ray.data as rd

    import pyarrow as pa

    from ollama_ocr_ray.oracle import extract_document
    from ollama_ocr_ray.pipelines.extract import extract_pipeline
    from ollama_ocr_ray.schema import DOCUMENTS_SCHEMA

    n = 10_000
    doc = {
        "doc_id": "wide-1",
        "spans": [
            {"kind": "media", "text": "", "media_ref": f"media://wide/{i}",
             "offset": i}
            for i in range(n)
        ],
    }
    small = {
        "doc_id": "tiny-1",
        "spans": [{"kind": "text", "text": " ok ", "media_ref": "",
                   "offset": 0}],
    }
    table = pa.Table.from_pylist([doc, small], schema=DOCUMENTS_SCHEMA)
    out = extract_pipeline(rd.from_arrow(table), ocr_batch_size=512,
                           ocr_concurrency=(2, 4))
    rows = {
        r["doc_id"]: r["spans"]
        for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert len(rows["wide-1"]) == n
    want = extract_document(doc)["spans"]
    assert rows["wide-1"] == want          # exact order under the shuffle
    assert rows["tiny-1"][0]["text"] == "ok"


def test_auto_plan_empty_corpus(ray_session):
    import ray.data as rd

    from ollama_ocr_ray import synth
    from ollama_ocr_ray.pipelines.extract import auto_pipeline

    empty = rd.from_arrow(synth.gen_table(0))
    plan, out = auto_pipeline(empty, ocr_latency_ms=5.0)
    assert plan == "fused"
    n = sum(b.num_rows
            for b in out.iter_batches(batch_size=None, batch_format="pyarrow"))
    assert n == 0


def test_canonical_unfused_stage_chain(ray_session):
    """fuse_stages=False (separate explode/extract/OCR operators — the
    configuration for independently-scaled stateless stages) produces
    the same spans as the default fused-stage canonical plan."""
    import ray.data as rd

    import pyarrow as pa

    from ollama_ocr_ray import oracle, synth
    from ollama_ocr_ray.pipelines.extract import extract_pipeline

    table = synth.gen_table(40, seed=21)
    want = oracle.extract_corpus(table)
    out = extract_pipeline(rd.from_arrow(table), fuse_stages=False,
                           ocr_concurrency=(1, 2))
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                      for s in r["spans"]]
        for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert got == want
