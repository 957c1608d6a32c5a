"""Sketch aggregates: HyperLogLog approximate distinct counting.

The exact distinct-user path in ``relational.events_hourly`` shuffles
(key, user) rows — right at test sizes, quadratic pain at 100 TB.  The
scale path is a mergeable sketch: per-batch HLL registers are the ONLY
thing that crosses the exchange (2^p bytes per group per batch,
independent of cardinality), merged by elementwise max, estimated once
at the end.  Classic Flajolet-Martin/HLL with the standard bias
correction; p=12 → ~1.6% standard error in 4 KiB per group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(arr: np.ndarray) -> np.ndarray:
    """Cheap 64-bit mix (splitmix64) of an int64/uint64 key array —
    vectorized, deterministic across processes."""
    x = arr.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hll_registers(values: np.ndarray, p: int = 12) -> np.ndarray:
    """uint8[2^p] register array for one group of int64 values."""
    m = 1 << p
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # low bits padded with ones so the value is never 0 and the rank is
    # naturally capped at 64-p+1
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # EXACT integer leading-zero count: smear the MSB down, popcount.
    # (A float64 log2 can round values within half an ulp below a power
    # of two UP to it, overstating the rank — e.g. rest = 2^60 - 1.)
    x = rest.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    pop = np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1)
    rank = (64 - pop + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, key_col: str, value_col: str, p: int = 12):
    """Dataset → (key, approx_distinct) via mergeable HLL partials.

    Per batch: one register array per key (binary column) — the shuffle
    carries sketches, never values.  Merge: elementwise max inside a
    small ``map_groups`` over the (tiny) per-key partials.
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        keys = np.asarray(batch.column(key_col))
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        out_k, out_r = [], []
        for k in np.unique(keys):
            out_k.append(k)
            out_r.append(hll_registers(vals[keys == k], p).tobytes())
        return pa.table(
            {
                key_col: pa.array(out_k),
                "regs": pa.array(out_r, type=pa.binary()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        regs = np.zeros(1 << p, dtype=np.uint8)
        for b in group.column("regs").to_pylist():
            np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "approx_distinct": pa.array(
                    [hll_estimate(regs)], type=pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def grouped_quantiles(ds, key_col: str, value_col: str,
                      qs=(0.5, 0.9, 0.99)):
    """Dataset → (key, p50, p90, ...) EXACT discrete quantiles via
    mergeable value-histogram partials.

    Works when the value domain is bounded discrete (chars, tokens,
    pages — the data-quality columns): per batch, one (key, value,
    cnt) row per distinct pair, so the exchange is histogram-sized —
    independent of row count, the t-digest trade without the
    approximation.  The final per-key step walks the merged histogram's
    cumulative counts: rank_q = max(1, ceil(n*q)) computed in float64,
    matching DuckDB's ``quantile_disc`` bit-for-bit (probed at the
    n*q-integer boundaries, e.g. n=100 q=0.99).
    """
    import math

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        hist = (
            pa.table({key_col: batch.column(key_col),
                      value_col: batch.column(value_col)})
            .group_by([key_col, value_col])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {key_col: hist.column(key_col),
             value_col: hist.column(value_col),
             "cnt": hist.column("count_all").cast(pa.int64())}
        )

    def finish(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        vals = group.column(value_col).to_numpy(zero_copy_only=False)
        cnts = group.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        cols = {key_col: group.column(key_col).slice(0, 1)}
        for q in qs:
            rank = max(1, math.ceil(n * q))
            v = vals[np.searchsorted(cum, rank, side="left")]
            name = f"p{q * 100:g}".replace(".", "_")
            cols[name] = pa.array([int(v)], type=pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, value_col])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby(key_col)
        .map_groups(finish, batch_format="pyarrow")
    )


def _token_counts(batch: pa.Table, text_col: str) -> pa.Table:
    """(token, cnt) exact term frequencies for one block — the shared
    tokenization contract (lowercase, whitespace split, empties
    dropped; same as ``text.vocab_df_partial`` / the ``_LTOKS_SQL``
    oracle expression), counted with pure Arrow kernels."""
    import pyarrow.compute as pc

    toks = pc.utf8_split_whitespace(pc.utf8_lower(batch.column(text_col)))
    flat = pc.list_flatten(toks)
    flat = pc.filter(flat, pc.not_equal(flat, ""))
    counted = (
        pa.table({"token": flat})
        .group_by("token")
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {"token": counted.column("token"),
         "cnt": counted.column("count_all").cast(pa.int64())}
    )


def heavy_hitters_exact(docs, *, k: int = 10, m: int = 256,
                        text_col: str = "text"):
    """EXACT top-``k`` tokens by total occurrences, with every exchange
    bounded by ``m x blocks`` rows — the web-scale alternative to a
    full (token, count) shuffle, whose key space at 100 TB is the
    unbounded long tail of typos/URLs/hashes, not a dictionary.

    Two passes (Misra-Gries-style candidates, then exact re-count):

    1. Per block: exact counts, keep the top ``m``.  Any token with
       block count > n_b/m is in the block's top-m (at most m-1 tokens
       can exceed that bar), so summing survivors' counts gives a
       lower bound L(t) with true(t) - N/m <= L(t) <= true(t), where N
       is the total token count (shipped as one sentinel row per block
       under the empty-string token, which tokenization can never
       emit).  Merged partials are <= m x blocks rows.
    2. Candidates = every token whose L is within N/m of the k-th
       largest L (a superset of the true top-k by the bound above),
       collected from the top 4m merged rows.  If the candidate cut
       is not provably inside that driver-bounded prefix, or fewer
       than k candidates survive, raise loudly — the fix is a larger
       ``m``, never a silently-approximate answer.  The candidate set
       is then broadcast and re-counted exactly in one more streaming
       pass whose exchange is candidate-sized.

    Ties at the k-th slot break (cnt DESC, token ASC) — the SQL
    ``ORDER BY cnt DESC, token LIMIT k`` contract.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def top_m_partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        counted = _token_counts(batch, text_col)
        cnt = counted.column("cnt").to_numpy(zero_copy_only=False)
        total = int(cnt.sum()) if len(cnt) else 0
        if len(cnt) > m:
            keep = np.argpartition(cnt, len(cnt) - m)[len(cnt) - m:]
            counted = counted.take(pa.array(np.sort(keep)))
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [pa.array([""], type=pa.string()),
                     counted.column("token").combine_chunks()]
                ),
                "cnt": pa.concat_arrays(
                    [pa.array([total], type=pa.int64()),
                     counted.column("cnt").combine_chunks()]
                ),
            }
        )

    merged = (
        docs.map_batches(top_m_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    head = merged.sort(["cnt", "token"], descending=[True, False]) \
                 .limit(4 * m + 1).take_all()
    total_n = next(r["cnt"] for r in head if r["token"] == "")
    lower = [(r["token"], r["cnt"]) for r in head if r["token"] != ""]
    if len(lower) < k:
        raise ValueError(
            f"heavy_hitters_exact: vocabulary has only {len(lower)} "
            f"tokens visible in the top-{4 * m} merged prefix; need k={k}"
        )
    slack = -(-total_n // m)  # ceil(N/m)
    cut = lower[k - 1][1] - slack
    if len(lower) >= 4 * m and lower[-1][1] >= cut:
        raise ValueError(
            "heavy_hitters_exact: candidate cut not contained in the "
            f"driver-bounded prefix (tail L={lower[-1][1]} >= cut={cut}); "
            "increase m"
        )
    cand = pa.array([t for t, c in lower if c >= cut], type=pa.string())

    def exact_partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        counted = _token_counts(batch, text_col)
        return counted.filter(
            pc.is_in(counted.column("token"), value_set=cand)
        )

    return (
        docs.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )
