"""PDF layout parsing — stage-side implementation.

Engine analog of PDF → ordered pages → per-page text
(``/root/reference/ocr_router.py:250-310``): the synthetic layout
payload is newline-separated ``page|y|x|block-text`` records in
arbitrary order; output is one text per page, blocks stable-sorted by
(page, y, x), pages ascending (spec §pdf).  Independent of
``oracle.extract_pdf`` (different parse/group structure).
"""

from __future__ import annotations

from itertools import groupby

from ..spec import collapse_ws


def parse_pdf_stage(payload: str) -> list[str]:
    parsed = []
    for seq, line in enumerate(payload.splitlines()):
        head, sep, rest = line.partition("|")
        if not sep:
            continue
        ytxt, sep, rest = rest.partition("|")
        if not sep:
            continue
        xtxt, sep, text = rest.partition("|")
        if not sep:
            continue
        if not (_is_int(head) and _is_int(ytxt) and _is_int(xtxt)):
            continue
        parsed.append((int(head), int(ytxt), int(xtxt), seq, text))
    # stable by construction: seq breaks (page, y, x) ties in payload order
    parsed.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    pages: list[str] = []
    for _page, blocks in groupby(parsed, key=lambda r: r[0]):
        texts = [t for t in (collapse_ws(b[4]) for b in blocks) if t]
        if texts:
            pages.append("\n".join(texts))
    return pages


def _is_int(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False
