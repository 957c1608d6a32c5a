"""Deterministic synthetic corpus generator for the interleaved
text+media `documents` table (BASELINE.json input_hint shape).

The reference's implicit corpus is 5 files in ``/root/reference/images/``
(4 images + 1 multi-page PDF, README.md:168-189); this generator
reproduces that coverage — printed/HTML-style content, handwriting-style
media spans, multi-page PDF layouts, corrupt-media error cases, plus a
skew knob (media-heavy documents) — at arbitrary scale.

Determinism: every document is a pure function of ``(seed, doc_index)``
(per-doc ``random.Random``), so generation is order-independent and can
run distributed (``synthesize_dataset`` maps the generator over a
``ray.data.range``) while producing exactly the same corpus as the
sequential ``gen_table``.  This mirrors the reference's determinism
knobs (fixed seed/temperature, ``ollama_local_ocr.py:143-144``).
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from .schema import DOCUMENTS_SCHEMA

# --- corpus shape knobs (FIXTURES.md §1) -----------------------------------
KIND_WEIGHTS = [("html", 0.30), ("pdf", 0.20), ("text", 0.25), ("media", 0.25)]
HEAVY_DOC_FRACTION = 0.01
HEAVY_MEDIA_SPANS = 220       # ≥200 media spans → skew fixture
CORRUPT_MEDIA_FRACTION = 0.02
MAX_SPANS_PER_DOC = 64

WORDS = (
    "the quick brown fox jumps over a lazy dog while morning light "
    "filters through tall windows and the city wakes to distant sirens "
    "coffee steam rises from ceramic cups as commuters board crowded "
    "trains reading folded papers about markets weather politics sports "
    "science art travel recipes gardens music history maps rivers "
    "mountains harbors engines signals ledgers invoices totals dates"
).split()

STOPWORDS = {"the", "a", "and", "of", "to", "in", "as", "while", "over"}


def _sentence(rng: random.Random, lo: int = 6, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _html_payload(rng: random.Random) -> str:
    """Well-formed page markup: boilerplate (nav/aside/footer link farms,
    script/style junk) wrapping a main-content subtree."""
    parts = ["<html><head><title>", _sentence(rng, 2, 5), "</title>",
             "<script>var x = 1; /* junk */</script>",
             "<style>.c{color:red}</style></head><body>"]
    # nav link farm (pruned subtree)
    parts.append("<nav><ul>")
    for _ in range(rng.randint(3, 7)):
        parts.append(f'<li><a href="/x">{rng.choice(WORDS)}</a></li>')
    parts.append("</ul></nav>")
    parts.append('<div id="main">')
    parts.append(f"<h1>{_sentence(rng, 2, 6)}</h1>")
    for _ in range(rng.randint(2, 6)):
        roll = rng.random()
        if roll < 0.55:
            # real paragraph, long enough to keep; sometimes inline link/entity/markup
            body = _sentence(rng, 10, 30)
            if rng.random() < 0.3:
                body += f' see <a href="/l">{rng.choice(WORDS)}</a> for more'
            if rng.random() < 0.2:
                body += " &amp; more &lt;notes&gt;"
            if rng.random() < 0.2:
                body = body.replace(" ", " <b>bold</b> ", 1)
            parts.append(f"<p>{body}</p>")
        elif roll < 0.7:
            parts.append(f"<p>{_sentence(rng, 1, 3)}</p>")           # too short → dropped
        elif roll < 0.8:
            # link-dense paragraph → dropped by link density
            links = " ".join(
                f'<a href="/s">{_sentence(rng, 2, 4)}</a>' for _ in range(3)
            )
            parts.append(f"<p>{links} {rng.choice(WORDS)}</p>")
        elif roll < 0.9:
            parts.append("<ul>" + "".join(
                f"<li>{_sentence(rng, 5, 12)}</li>" for _ in range(rng.randint(2, 4))
            ) + "</ul>")
        else:
            parts.append(f"<blockquote><p>{_sentence(rng, 8, 20)}</p></blockquote>")
    if rng.random() < 0.4:
        parts.append(f"<h2>{_sentence(rng, 2, 5)}</h2>")
        parts.append(f"<p>{_sentence(rng, 10, 25)}</p>")
    if rng.random() < 0.3:
        parts.append("<table><tr>" + "".join(
            f"<td>{_sentence(rng, 4, 10)}</td>" for _ in range(2)
        ) + "</tr></table>")
    parts.append("</div>")
    # boilerplate tail
    parts.append("<aside>" + "".join(
        f'<a href="/a">{rng.choice(WORDS)}</a> ' for _ in range(4)
    ) + "</aside>")
    parts.append(f'<footer><p><a href="/t">terms</a> <a href="/p">privacy</a></p></footer>')
    parts.append("</body></html>")
    return "".join(parts)


def _pdf_payload(rng: random.Random) -> str:
    """Synthetic layout text: ``page|y|x|block-text`` records in shuffled
    order (analog of the PDF page/block model, ocr_router.py:250-310)."""
    lines: list[str] = []
    n_pages = rng.randint(1, 5)
    for page in range(1, n_pages + 1):
        ys = [rng.randint(0, 90) * 10 for _ in range(rng.randint(2, 7))]
        for y in ys:
            x = rng.randint(0, 50) * 10
            roll = rng.random()
            if roll < 0.08:
                text = ""                       # empty block → dropped
            elif roll < 0.14:
                text = "   "                    # whitespace block → dropped
            else:
                text = _sentence(rng, 4, 16)
                if rng.random() < 0.15:
                    text = "  " + text + "  "   # padding → collapsed
            lines.append(f"{page}|{y}|{x}|{text}")
    rng.shuffle(lines)
    return "\n".join(lines)


def _text_payload(rng: random.Random) -> str:
    if rng.random() < 0.05:
        return "   \n\t "                       # whitespace-only → no output span
    pad_l = " " * rng.randint(0, 3)
    pad_r = "\n" * rng.randint(0, 2)
    return pad_l + _sentence(rng, 8, 40) + pad_r


def make_doc(doc_index: int, seed: int = 42) -> dict:
    """One document row — pure function of (seed, doc_index)."""
    rng = random.Random((seed << 32) ^ doc_index)
    doc_id = f"doc-{doc_index:08d}"
    heavy = rng.random() < HEAVY_DOC_FRACTION
    if heavy:
        n_spans = HEAVY_MEDIA_SPANS + rng.randint(0, 30)
    else:
        n_spans = 1 + min(MAX_SPANS_PER_DOC - 1, int(rng.paretovariate(1.3)))
    spans = []
    for off in range(n_spans):
        if heavy and rng.random() < 0.92:
            kind = "media"
        else:
            r, kind, acc = rng.random(), KIND_WEIGHTS[-1][0], 0.0
            for k, w in KIND_WEIGHTS:
                acc += w
                if r < acc:
                    kind = k
                    break
        text, media_ref = "", ""
        if kind == "html":
            text = _html_payload(rng)
        elif kind == "pdf":
            text = _pdf_payload(rng)
        elif kind == "text":
            text = _text_payload(rng)
        else:
            media_ref = f"media://{doc_id}/{off}"
            if rng.random() < CORRUPT_MEDIA_FRACTION:
                media_ref += "#corrupt"
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": off})
    return {"doc_id": doc_id, "spans": spans}


def gen_table(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Sequential generation → Arrow table in DOCUMENTS_SCHEMA."""
    rows = [make_doc(i, seed) for i in range(start, start + n_docs)]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def _gen_batch(batch: dict, seed: int) -> pa.Table:
    idx = batch["id"]
    rows = [make_doc(int(i), seed) for i in np.asarray(idx)]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def synthesize_dataset(n_docs: int, seed: int = 42):
    """Distributed generation as a ``ray.data`` pipeline (caller owns the
    Ray session).  Same corpus as ``gen_table`` for any n_docs/seed."""
    import ray.data as rd

    return rd.range(n_docs).map_batches(
        _gen_batch, fn_kwargs={"seed": seed}, batch_format="numpy",
        batch_size=256,
    )


def write_corpus(out_dir: str, n_docs: int, seed: int = 42) -> str:
    """Materialize a corpus to partitioned parquet (cached by shape)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(out_dir, f"docs_n{n_docs}_s{seed}")
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    chunk = max(1, min(4096, n_docs // 8 or n_docs))
    pidx = 0
    for start in range(0, n_docs, chunk):
        t = gen_table(min(chunk, n_docs - start), seed, start=start)
        pq.write_table(t, os.path.join(path, f"part-{pidx:05d}.parquet"))
        pidx += 1
    with open(done, "w") as f:
        f.write("ok")
    return path
