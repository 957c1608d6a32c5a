"""Corpus-level line dedup (dedup.remove_common_lines).

The reference oracle here is an INDEPENDENT pure-Python implementation
(Counter over split lines) — kept separate from the engine per the
span-equality contract convention (CLAUDE.md)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ollama_ocr_ray.functions.dedup import (
    common_line_droplist,
    remove_common_lines,
)


def _py_reference(docs, delim, min_len, min_count):
    counts = Counter()
    for _, text in docs:
        for line in text.split(delim):
            if len(line) >= min_len:
                counts[line] += 1
    drop = {l for l, c in counts.items() if c >= min_count}
    out = {}
    for doc_id, text in docs:
        lines = text.split(delim)
        kept = [l for l in lines if not (len(l) >= min_len and l in drop)]
        out[doc_id] = (delim.join(kept), len(kept), len(lines) - len(kept))
    return out


def _check(got_rows, docs, delim, min_len, min_count):
    exp = _py_reference(docs, delim, min_len, min_count)
    got = {r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
           for r in got_rows}
    assert got == exp


def test_line_dedup_reference_parity(ray_session):
    """Seeded random corpus with planted boilerplate lines at varied
    multiplicities (below / at / above min_count), short duplicated
    lines that must survive, and docs that empty out entirely."""
    rng = np.random.default_rng(7)
    boiler = [
        "SUBSCRIBE TO OUR NEWSLETTER TODAY",      # planted 12x
        "c 2024 example corp all rights reserved",  # planted 3x (== K)
        "accept cookies to continue",               # planted 2x (< K)
    ]
    short_dup = "ok"  # duplicated but < min_len: never dropped
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = []
    planted = [0] * len(boiler)
    for i in range(60):
        lines = [" ".join(rng.choice(words, size=rng.integers(2, 6)))
                 + f" u{i}_{j}" for j in range(int(rng.integers(1, 4)))]
        if i < 12:
            lines.insert(int(rng.integers(0, len(lines) + 1)), boiler[0])
            planted[0] += 1
        if i % 20 == 0:
            lines.append(boiler[1])
            planted[1] += 1
        if i in (5, 25):
            lines.insert(0, boiler[2])
            planted[2] += 1
        if i % 15 == 3:
            lines.append(short_dup)
        docs.append((i, "\n".join(lines)))
    docs.append((100, boiler[0]))                  # empties out
    docs.append((101, ""))                          # empty text
    planted[0] += 1
    assert planted == [13, 3, 2]

    t = pa.table({"doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                  "text": pa.array([x for _, x in docs])})
    ds = rd.from_arrow(t)
    out = remove_common_lines(ds, delim="\n", min_len=10, min_count=3)
    rows = out.take_all()
    _check(rows, docs, "\n", 10, 3)
    # the boilerplate actually dropped: every instance of lines 0 and 1
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[100]["text"] == "" and by_id[100]["n_dropped"] == 1
    assert sum(r["n_dropped"] for r in rows) == planted[0] + planted[1]


def test_line_dedup_forced_split(ray_session):
    """A hot boilerplate line duplicated across MANY input blocks: the
    count exchange's sorted run for its hash spans blocks, exercising
    the exact_segment_fold boundary routing; counts must still be
    exact (one instance under min_count => kept everywhere)."""
    hot = "THIS EXACT BOILERPLATE LINE REPEATS EVERYWHERE"
    docs = [(i, f"unique payload row {i}\n{hot}") for i in range(400)]
    # a near-miss line appearing exactly min_count-1 times
    near = "APPEARS JUST UNDER THE THRESHOLD LINE"
    docs += [(1000 + i, f"{near}\nfiller content {i}") for i in range(9)]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                  "text": pa.array([x for _, x in docs])})
    ds = rd.from_arrow(t).repartition(20)
    out = remove_common_lines(ds, delim="\n", min_len=10, min_count=10)
    _check(out.take_all(), docs, "\n", 10, 10)


def test_line_dedup_droplist_and_cap(ray_session):
    docs = [(i, "common line payload\nunique %d" % i) for i in range(6)]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                  "text": pa.array([x for _, x in docs])})
    ds = rd.from_arrow(t)
    dl = common_line_droplist(ds, delim="\n", min_len=10, min_count=3)
    assert dl.count() == 1
    with pytest.raises(RuntimeError, match="droplist exceeds the driver"):
        remove_common_lines(ds, delim="\n", min_len=5, min_count=1, cap=2)
    # min_count above any multiplicity: a no-op rewrite
    rows = remove_common_lines(
        ds, delim="\n", min_len=10, min_count=99).take_all()
    _check(rows, docs, "\n", 10, 99)
    assert all(r["n_dropped"] == 0 for r in rows)


# --- duplicated-substring removal (dedup.strip_dup_substrings) --------------

def _py_strip_reference(docs, k, min_docs):
    """Independent brute force: raw substrings, sets, per-char cover."""
    from collections import defaultdict

    owners = defaultdict(set)
    for doc_id, text in docs:
        for i in range(max(len(text) - k + 1, 0)):
            owners[text[i:i + k]].add(doc_id)
    dup = {s for s, o in owners.items() if len(o) >= min_docs}
    out = {}
    for doc_id, text in docs:
        covered = set()
        for i in range(max(len(text) - k + 1, 0)):
            if text[i:i + k] in dup:
                covered.update(range(i, i + k))
        kept = "".join(c for j, c in enumerate(text) if j not in covered)
        out[doc_id] = (kept, len(covered))
    return out


def _strip_check(got_rows, docs, k, min_docs):
    exp = _py_strip_reference(docs, k, min_docs)
    got = {r["doc_id"]: (r["text"], r["n_removed"]) for r in got_rows}
    assert got == exp


def test_strip_dup_substrings_reference_parity(ray_session):
    """Planted shared boilerplate at different positions/contexts (the
    coverage spreads through shared context windows), overlapping
    repeats within one doc, docs below k, and a fully-covered doc."""
    import numpy as np

    from ollama_ocr_ray.functions.dedup import strip_dup_substrings

    rng = np.random.default_rng(11)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    boiler = "SHARED BOILERPLATE SEGMENT WELL OVER TWENTY FIVE CHARS"

    def rand(n):
        return "".join(rng.choice(list(alpha), size=n))

    docs = [
        (0, rand(40) + boiler + rand(40)),
        (1, boiler + rand(30)),
        (2, rand(25) + boiler + " mid " + boiler),
        (3, rand(120)),          # unique
        (4, "short"),            # below k
        (5, boiler),             # fully covered
    ]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                  "text": pa.array([x for _, x in docs])})
    got = strip_dup_substrings(rd.from_arrow(t), k=25).take_all()
    _strip_check(got, docs, 25, 2)
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[5]["text"] == ""
    assert by_id[3]["n_removed"] == 0


def test_strip_dup_substrings_forced_split_and_cap(ray_session):
    """A window duplicated across 300 docs in 20 blocks exercises the
    droplist fold's boundary routing; the broadcast cap trips loudly."""
    import pytest as _pytest

    from ollama_ocr_ray.functions.dedup import strip_dup_substrings

    hot = "VIRAL FOOTER LINE REPEATED IN EVERY SINGLE DOCUMENT"
    docs = [(i, f"payload number {i:06d} then {hot}") for i in range(300)]
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                  "text": pa.array([x for _, x in docs])})
    ds = rd.from_arrow(t).repartition(20)
    _strip_check(strip_dup_substrings(ds, k=25).take_all(), docs, 25, 2)
    with _pytest.raises(RuntimeError, match="droplist exceeds the driver"):
        strip_dup_substrings(ds, k=25, cap=3)


# --- intra-document line dedup ------------------------------------------------


def _py_intradoc(docs, delim, min_len):
    out = {}
    for doc_id, text in docs:
        seen = set()
        kept = []
        lines = text.split(delim)
        for line in lines:
            if len(line) >= min_len:
                if line in seen:
                    continue
                seen.add(line)
            kept.append(line)
        out[doc_id] = (delim.join(kept), len(kept), len(lines) - len(kept))
    return out


INTRA_DOCS = [
    (0, "alpha beta alpha gamma beta"),          # word repeats
    (1, "unique lines only here"),
    (2, ""),                                      # empty text
    (3, "dup dup dup dup"),                       # all-repeat short words
    (4, "longerline longerline tail longerline"),
    (5, "x y x y x y"),                           # short: always kept
]


@pytest.mark.parametrize("nblocks", [1, 4])
@pytest.mark.parametrize("min_len", [1, 5])
def test_intradoc_dedup_brute_force(ray_session, nblocks, min_len):
    from ollama_ocr_ray.functions.dedup import dedup_lines_within_doc

    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in INTRA_DOCS], type=pa.int64()),
            "text": pa.array([t for _, t in INTRA_DOCS]),
        }
    )
    ds = rd.from_arrow(t).repartition(nblocks)
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
        for r in dedup_lines_within_doc(
            ds, delim=" ", min_len=min_len
        ).take_all()
    }
    assert got == _py_intradoc(INTRA_DOCS, " ", min_len)


def test_intradoc_dedup_newline_delim(ray_session):
    from ollama_ocr_ray.functions.dedup import dedup_lines_within_doc

    docs = [
        (0, "cookie banner text\nreal content one\ncookie banner text\n"
            "real content two"),
        (1, "a\nb\na"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs]),
        }
    )
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
        for r in dedup_lines_within_doc(
            rd.from_arrow(t), delim="\n", min_len=10
        ).take_all()
    }
    assert got == _py_intradoc(docs, "\n", 10)
    assert got[0][0] == ("cookie banner text\nreal content one\n"
                         "real content two")
