"""DSIR-style hashed importance weighting (functions/dsir.py): exact
brute-force parity, partitioning invariance, selection determinism."""

import numpy as np
import pyarrow as pa
import pytest

from ollama_ocr_ray.functions.dsir import (
    N_BUCKETS,
    W_SCALE,
    dsir_scores,
    dsir_select,
    train_dsir_weights,
)

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the the the the", "en"),
    (2, "", "en"),
    (3, "   \t\n  ", "de"),
    (4, "der Hund und die Katze", "de"),
    (5, "one", "en"),
    (6, "café naïve 中文 tokens mixed", "fr"),
    (7, "the cat sat on the mat", "de"),
]


def _table():
    ids, texts, langs = zip(*DOCS)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def _brute_force():
    """Independent scalar recomputation: per-token Horner hash chain
    (the reference kernel contract), unigram + adjacent-bigram
    features, smoothed integer ratio weights."""
    from ollama_ocr_ray.functions.text import _token_hash60

    def feats(text):
        toks = text.lower().split()
        out = list(toks)
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return out

    def bucket(tok):
        return _token_hash60(tok) % N_BUCKETS

    n_all = {}
    n_tgt = {}
    for _, text, lang in DOCS:
        for f in feats(text):
            b = bucket(f)
            n_all[b] = n_all.get(b, 0) + 1
            if lang == "en":
                n_tgt[b] = n_tgt.get(b, 0) + 1

    def w(b):
        return ((n_tgt.get(b, 0) + 1) * W_SCALE) // (n_all.get(b, 0) + 1)

    rows = {}
    for doc_id, text, _ in DOCS:
        fs = feats(text)
        score = sum(w(bucket(f)) for f in fs)
        rows[doc_id] = (
            len(fs),
            score,
            score // len(fs) if fs else 0,
        )
    return rows


def _collect(ds):
    t = pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    return {
        r["doc_id"]: (r["n_feats"], r["dsir_score"], r["avg_w_bp"])
        for r in t.to_pylist()
    }


def test_dsir_scores_brute_force(ray_session):
    import ray.data as rd

    got = _collect(dsir_scores(rd.from_arrow(_table())))
    assert got == _brute_force()


@pytest.mark.parametrize("nblocks", [1, 7])
def test_dsir_partitioning_invariance(ray_session, nblocks):
    import ray.data as rd

    ds = rd.from_arrow(_table()).repartition(nblocks)
    assert _collect(dsir_scores(ds)) == _brute_force()


def test_dsir_select_topk_order(ray_session):
    import ray.data as rd

    expected = _brute_force()
    order = sorted(expected, key=lambda d: (-expected[d][2], d))
    sel = dsir_select(rd.from_arrow(_table()), k=3)
    rows = pa.concat_tables(
        list(sel.iter_batches(batch_size=None, batch_format="pyarrow"))
    ).to_pylist()
    assert sorted(r["doc_id"] for r in rows) == sorted(order[:3])
    # k past the corpus returns every row
    sel_all = dsir_select(rd.from_arrow(_table()), k=100)
    assert sel_all.count() == len(DOCS)


def test_dsir_cross_corpus_weights(ray_session):
    """Weights trained on one corpus score a DIFFERENT corpus: unhit
    buckets carry the formula-consistent (t=0, r=0) smoothed W_SCALE."""
    import ray.data as rd

    w = train_dsir_weights(rd.from_arrow(_table()))
    assert w.shape == (N_BUCKETS,)
    other = pa.table(
        {
            "doc_id": pa.array([100], type=pa.int64()),
            "text": pa.array(["zzzzunseen wordzzz"], type=pa.string()),
            "lang": pa.array(["en"], type=pa.string()),
        }
    )
    got = _collect(dsir_scores(rd.from_arrow(other), weights=w))
    n_feats, score, avg = got[100]
    assert n_feats == 3  # 2 unigrams + 1 bigram
    # every feature unseen in training: all carry the default weight
    assert score == 3 * W_SCALE and avg == W_SCALE
