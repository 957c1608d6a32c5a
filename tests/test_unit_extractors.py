"""Unit tests: per-operator, table-in/table-out, no Ray needed.

Each operator is checked against hand-built inputs AND against the
independently-written oracle on random payloads (SURVEY.md §5.2.1/5).
"""

import random

import pyarrow as pa

from ollama_ocr_ray import oracle, spec, synth
from ollama_ocr_ray.stages.explode import DOC_SENTINEL, explode_batch
from ollama_ocr_ray.stages.extract import extract_batch
from ollama_ocr_ray.stages.html_extract import extract_html_stage
from ollama_ocr_ray.stages.ocr import OcrModel
from ollama_ocr_ray.stages.pdf_parse import parse_pdf_stage
from ollama_ocr_ray.stages.reassemble import reassemble_group


# --- HTML -------------------------------------------------------------------
def test_html_boilerplate_pruned():
    m = ("<html><body><nav><a href='/'>home is where all the links go "
         "and they go on and on</a></nav>"
         "<p>this paragraph is long enough to pass the minimum block "
         "size filter easily</p></body></html>")
    assert extract_html_stage(m) == [
        "this paragraph is long enough to pass the minimum block size filter easily"
    ]


def test_html_link_density_drop():
    m = ("<p><a>many linked words here filling space</a> "
         "<a>and even more linked words</a> tail</p>")
    assert extract_html_stage(m) == []


def test_html_short_block_dropped_heading_kept():
    m = "<h2>Tiny</h2><p>too short</p>"
    assert extract_html_stage(m) == ["Tiny"]


def test_html_entities_and_inline_markup():
    m = "<p>alpha &amp; beta <b>gamma</b> delta padded to minimum length ok</p>"
    out = extract_html_stage(m)
    assert out == ["alpha & beta gamma delta padded to minimum length ok"]


def test_html_nested_blocks_leaf_only():
    m = ("<blockquote>intro words <p>the inner paragraph is long enough "
         "to be kept by the filter</p></blockquote>")
    assert extract_html_stage(m) == [
        "the inner paragraph is long enough to be kept by the filter"
    ]


def test_html_stage_matches_oracle_random():
    rng = random.Random(1234)
    for _ in range(200):
        m = synth._html_payload(rng)
        assert extract_html_stage(m) == oracle.extract_html(m)


# --- PDF --------------------------------------------------------------------
def test_pdf_block_order_and_pages():
    payload = "2|10|0|second page\n1|20|5|b\n1|10|0|a\n1|20|0|ab\nnoise\n1|5|0|"
    assert parse_pdf_stage(payload) == ["a\nab\nb", "second page"]


def test_pdf_stage_matches_oracle_random():
    rng = random.Random(99)
    for _ in range(200):
        p = synth._pdf_payload(rng)
        assert parse_pdf_stage(p) == oracle.extract_pdf(p)


# --- OCR actor --------------------------------------------------------------
def _span_batch(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "offset": pa.array([r[1] for r in rows], type=pa.int32()),
            "sub": pa.array([0] * len(rows), type=pa.int32()),
            "kind": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "media_ref": pa.array([r[4] for r in rows]),
        }
    )


def test_ocr_actor_transcribes_and_errors():
    model = OcrModel()
    batch = _span_batch(
        [
            ("d1", 0, "media", "", "media://d1/0"),
            ("d1", 1, "media", "", "media://d1/1#corrupt"),
            ("d1", 2, "text", "keep me", ""),
        ]
    )
    out = model(batch)
    rows = {r["offset"]: r for r in out.to_pylist()}
    assert rows[0]["kind"] == "ocr"
    assert rows[0]["text"] == spec.mock_transcript("media://d1/0")
    assert rows[1]["kind"] == "error"
    assert rows[1]["text"] == spec.ERROR_TEXT
    assert rows[1]["media_ref"] == "media://d1/1#corrupt"
    assert rows[2]["kind"] == "text" and rows[2]["text"] == "keep me"
    assert "ocr_ms" in out.column_names


# --- explode / extract / reassemble round trip ------------------------------
def test_explode_emits_sentinels_and_spans():
    t = synth.gen_table(5, seed=42)
    ex = explode_batch(t)
    kinds = ex.column("kind").to_pylist()
    assert kinds.count(DOC_SENTINEL) == 5
    n_spans = sum(len(r["spans"]) for r in t.to_pylist())
    assert len(ex) == n_spans + 5


def test_batch_roundtrip_matches_oracle():
    t = synth.gen_table(40, seed=7)
    spans = OcrModel()(extract_batch(explode_batch(t)))
    expected = oracle.extract_corpus(t)
    got = {}
    for doc_id in expected:
        import pyarrow.compute as pc

        grp = spans.filter(pc.equal(spans.column("doc_id"), doc_id))
        row = reassemble_group(grp).to_pylist()[0]
        got[doc_id] = [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]
        ]
    assert got == expected


def test_empty_doc_preserved():
    t = pa.Table.from_pylist(
        [
            {
                "doc_id": "d-empty",
                "spans": [
                    {"kind": "text", "text": "   ", "media_ref": "", "offset": 0}
                ],
            }
        ],
        schema=synth.DOCUMENTS_SCHEMA,
    )
    spans = OcrModel()(extract_batch(explode_batch(t)))
    row = reassemble_group(spans).to_pylist()[0]
    assert row["doc_id"] == "d-empty" and row["spans"] == []


# --- generator determinism --------------------------------------------------
def test_synth_deterministic_and_order_independent():
    a = synth.make_doc(17, seed=42)
    b = synth.make_doc(17, seed=42)
    assert a == b
    t1 = synth.gen_table(10, seed=42)
    t2 = synth.gen_table(5, seed=42, start=5)
    assert t1.slice(5, 5).to_pylist() == t2.to_pylist()


def test_corpus_has_all_fixture_features():
    t = synth.gen_table(400, seed=42)
    kinds, corrupt, heavy = set(), 0, 0
    for r in t.to_pylist():
        n_media = 0
        for s in r["spans"]:
            kinds.add(s["kind"])
            if s["kind"] == "media":
                n_media += 1
                if s["media_ref"].endswith(spec.CORRUPT_SUFFIX):
                    corrupt += 1
        if n_media >= 200:
            heavy += 1
    assert kinds == {"html", "pdf", "text", "media"}
    assert corrupt > 0 and heavy > 0


def test_unknown_kind_becomes_error_span_everywhere():
    """Unknown span kinds yield the same inline error span in oracle,
    canonical stages, and fused extractor (found by a verify probe)."""
    from ollama_ocr_ray.pipelines.extract import FusedExtractor

    doc = {
        "doc_id": "d-bad",
        "spans": [{"kind": "video", "text": "", "media_ref": "m://x", "offset": 0}],
    }
    t = pa.Table.from_pylist([doc], schema=synth.DOCUMENTS_SCHEMA)
    expected = [
        {
            "kind": "error",
            "text": spec.unsupported_text("video"),
            "media_ref": "m://x",
            "order": 0,
        }
    ]
    assert oracle.extract_document(doc)["spans"] == expected
    spans = OcrModel()(extract_batch(explode_batch(t)))
    assert reassemble_group(spans).to_pylist()[0]["spans"] == expected
    assert FusedExtractor()(t).to_pylist()[0]["spans"] == expected
