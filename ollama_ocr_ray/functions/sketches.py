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


def exact_top_counts(docs, *, k: int, m: int, partial_counts,
                     allow_fewer: bool = False,
                     op: str = "exact_top_counts"):
    """EXACT top-``k`` (token, cnt) rows by SUMMED per-block partial
    counts, with every exchange bounded by ``m x blocks`` rows — the
    web-scale alternative to a full (token, count) shuffle, whose key
    space at 100 TB is the unbounded long tail of typos/URLs/hashes,
    not a dictionary.  Generalized in r5 (VERDICT #2) from
    ``heavy_hitters_exact`` so the tfidf vocabulary build shares it.

    ``partial_counts(batch) -> (token: string, cnt: int64)`` must be
    EXACT for its block, emit each token at most once per block, and
    never emit the empty-string token (reserved for the sentinel row).

    Two passes (Misra-Gries-style candidates, then exact re-count):

    1. Per block: exact partial counts, keep the top ``m``.  Any token
       with block count > n_b/m is in the block's top-m (at most m-1
       tokens can exceed that bar), so summing survivors' counts gives
       a lower bound L(t) with true(t) - N/m <= L(t) <= true(t), where
       N is the total count mass (shipped as one sentinel row per
       block under the empty-string token).  Merged partials are
       <= m x blocks rows.
    2. Candidates = every token whose L is within N/m of the k-th
       largest L (a superset of the true top-k by the bound above),
       collected from the top 4m merged rows.  Three certificates
       gate the answer, and a failed certificate RAISES — the fix is
       a larger ``m``, never a silently-approximate answer:
       (a) the cut is inside the driver-bounded prefix, (b) at least
       k candidates exist (unless ``allow_fewer`` and NO block
       truncated, in which case L is exact and the full — smaller —
       vocabulary is returned directly), (c) when the cut is <= 0 an
       UNSEEN token (dropped from every block's top-m, so L = 0 but
       true count up to N/m) could be a true heavy hitter — that case
       is only safe when NO block actually truncated, which the
       sentinel row tracks.  The candidate set is then broadcast and
       re-counted exactly in one more streaming pass whose exchange is
       candidate-sized.

    Ties at the k-th slot break (cnt DESC, token ASC) — the SQL
    ``ORDER BY cnt DESC, token LIMIT k`` contract.
    """
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def top_m_partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        counted = partial_counts(batch)
        cnt = counted.column("cnt").to_numpy(zero_copy_only=False)
        total = int(cnt.sum()) if len(cnt) else 0
        truncated = int(len(cnt) > m)
        if truncated:
            keep = np.argpartition(cnt, len(cnt) - m)[len(cnt) - m:]
            counted = counted.take(pa.array(np.sort(keep)))
        n_kept = counted.num_rows
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
                "trunc": pa.array([truncated] + [0] * n_kept,
                                  type=pa.int64()),
            }
        )

    merged = (
        docs.map_batches(top_m_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"),
                   Sum("trunc", alias_name="trunc"))
    )
    head = merged.sort(["cnt", "token"], descending=[True, False]) \
                 .limit(4 * m + 1).take_all()
    empty = pa.table({"token": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    sentinel = [r for r in head if r["token"] == ""]
    if not sentinel:
        return rd.from_arrow(empty)  # zero input rows / zero tokens
    total_n, any_trunc = sentinel[0]["cnt"], sentinel[0]["trunc"] > 0
    lower = [(r["token"], r["cnt"]) for r in head if r["token"] != ""]
    if not lower:
        return rd.from_arrow(empty)
    if len(lower) < k:
        if allow_fewer and not any_trunc and len(lower) < 4 * m:
            # no block ever truncated and the whole (small) vocabulary
            # fits in the driver-bounded prefix: L is exact — return it
            return rd.from_arrow(pa.table(
                {"token": pa.array([t for t, _ in lower],
                                   type=pa.string()),
                 "cnt": pa.array([c for _, c in lower],
                                 type=pa.int64())}
            ))
        raise ValueError(
            f"{op}: vocabulary has only {len(lower)} "
            f"tokens visible in the top-{4 * m} merged prefix; need k={k}"
        )
    slack = -(-total_n // m)  # ceil(N/m)
    cut = lower[k - 1][1] - slack
    if len(lower) >= 4 * m and lower[-1][1] >= cut:
        raise ValueError(
            f"{op}: candidate cut not contained in the "
            f"driver-bounded prefix (tail L={lower[-1][1]} >= cut={cut}); "
            "increase m"
        )
    if cut <= 0 and any_trunc:
        raise ValueError(
            f"{op}: candidate cut <= 0 while at least one "
            "block truncated its counts — a token unseen in every "
            f"block's top-m (true count up to N/m = {slack}) could be a "
            f"true heavy hitter (k-th lower bound {lower[k - 1][1]}); "
            "increase m"
        )
    cand = pa.array([t for t, c in lower if c >= cut], type=pa.string())

    def exact_partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        counted = partial_counts(batch)
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


def heavy_hitters_exact(docs, *, k: int = 10, m: int = 256,
                        text_col: str = "text"):
    """EXACT top-``k`` tokens by total occurrences — the
    ``exact_top_counts`` machinery over per-block exact term
    frequencies (see that docstring for the bound and certificates).
    Ties break (cnt DESC, token ASC), the SQL ``ORDER BY cnt DESC,
    token LIMIT k`` contract."""
    return exact_top_counts(
        docs, k=k, m=m,
        partial_counts=lambda b: _token_counts(b, text_col),
        op="heavy_hitters_exact",
    )


# --- KLL-style mergeable quantile sketch (continuous domains) --------------
#
# ``grouped_quantiles`` is exact but requires a bounded DISCRETE value
# domain (its exchange is histogram-sized).  A continuous float column
# (events.value at 100 TB) has no histogram: the mergeable-sketch path
# is a KLL compactor hierarchy (Karnin-Lang-Liberty 2016 shape) — level
# L holds values of weight 2^L; an over-full level sorts and promotes
# every other value.  Deterministic offset alternation (per-level
# promotion counter) replaces the coin flip so a (data, k) pair always
# yields the same sketch — reproducible across runs/partitionings at
# the cost of the adversarial-input guarantee, which the within-bound
# gate query measures rather than assumes.

_KLL_K = 200


def _kll_compact(levels: list, counters: list, k: int) -> None:
    """In-place: promote every over-capacity level upward."""
    lvl = 0
    while lvl < len(levels):
        if len(levels[lvl]) > k:
            vals = np.sort(levels[lvl], kind="stable")
            while len(counters) <= lvl:
                counters.append(0)
            off = counters[lvl] & 1
            counters[lvl] += 1
            promoted = vals[off::2]
            levels[lvl] = np.empty(0, dtype=np.float64)
            if lvl + 1 == len(levels):
                levels.append(np.empty(0, dtype=np.float64))
            levels[lvl + 1] = np.concatenate([levels[lvl + 1], promoted])
        lvl += 1


def kll_add(levels: list, counters: list, vals: np.ndarray,
            k: int = _KLL_K) -> None:
    levels[0] = np.concatenate([levels[0], vals.astype(np.float64)])
    _kll_compact(levels, counters, k)


def kll_merge(a_levels: list, a_counters: list, b_levels: list,
              k: int = _KLL_K) -> None:
    """Merge b into a, levelwise concat + recompact (weights align
    because level index IS the weight exponent)."""
    while len(a_levels) < len(b_levels):
        a_levels.append(np.empty(0, dtype=np.float64))
    for lvl, b in enumerate(b_levels):
        if len(b):
            a_levels[lvl] = np.concatenate([a_levels[lvl], b])
    _kll_compact(a_levels, a_counters, k)


def kll_quantile(levels: list, qs) -> list:
    """Weighted quantiles from the compactor hierarchy: sort the
    (value, 2^level) pairs, walk cumulative weight to rank ceil(W*q)."""
    vals = np.concatenate([lv for lv in levels if len(lv)] or
                          [np.empty(0)])
    if not len(vals):
        return [float("nan")] * len(qs)
    wts = np.concatenate(
        [np.full(len(lv), 1 << i, dtype=np.int64)
         for i, lv in enumerate(levels) if len(lv)]
    )
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = int(cum[-1])
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(total * q)))
        out.append(float(vals[np.searchsorted(cum, rank, side="left")]))
    return out


def approx_quantiles_kll(ds, key_col: str, value_col: str,
                         qs=(0.5, 0.9, 0.99), k: int = _KLL_K):
    """Dataset → (key, p50, p90, ...) approximate quantiles over a
    CONTINUOUS value column via mergeable KLL partials.

    Per batch: one sketch per key, serialized as flattened
    (key, level, value) rows — the exchange is sketch-sized
    (k·log(n/k) values per key per block), independent of row count
    and of the value domain.  Merge: levelwise concat + recompact in a
    small ``map_groups``.  Rank error ~O(1/k); the `value_quantiles`
    gate query measures it against exact ranks instead of trusting
    the bound."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        keys = np.asarray(batch.column(key_col))
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        out_k, out_l, out_v = [], [], []
        for kk in np.unique(keys):
            levels = [np.empty(0, dtype=np.float64)]
            kll_add(levels, [], vals[keys == kk], k)
            for lvl, lv in enumerate(levels):
                out_k.extend([kk] * len(lv))
                out_l.extend([lvl] * len(lv))
                out_v.extend(lv.tolist())
        return pa.table(
            {key_col: pa.array(out_k),
             "level": pa.array(out_l, type=pa.int64()),
             "value": pa.array(out_v, type=pa.float64())}
        )

    def merge(group: pa.Table) -> pa.Table:
        # canonical merge order (r5 VERDICT #7): sort the serialized
        # (level, value) rows before recompacting, so the merged
        # sketch is a function of the partial-row MULTISET — without
        # this, the streaming executor's nondeterministic block
        # arrival order could change which values each compaction
        # promotes, making the same run emit different (in-bound)
        # quantiles run to run.  Block-CONTENT dependence remains (the
        # price of any sublinear non-sampling sketch); the
        # partitioning-invariant contract is the rank-error bound,
        # which the value_quantiles gate measures every round.
        group = group.combine_chunks().sort_by(
            [("level", "ascending"), ("value", "ascending")]
        ).combine_chunks()
        lvls = group.column("level").to_numpy(zero_copy_only=False)
        vals = group.column("value").to_numpy(zero_copy_only=False)
        levels = [np.empty(0, dtype=np.float64)]
        counters: list = []
        for lvl in np.unique(lvls):
            b_levels = [np.empty(0, dtype=np.float64)] * int(lvl) + [
                vals[lvls == lvl]
            ]
            kll_merge(levels, counters, b_levels, k)
        est = kll_quantile(levels, qs)
        cols = {key_col: group.column(key_col).slice(0, 1)}
        for q, v in zip(qs, est):
            name = f"p{q * 100:g}".replace(".", "_")
            cols[name] = pa.array([v], type=pa.float64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pyarrow")
    )


def grouped_percent_rank(ds, key_col: str, value_col: str,
                         id_cols: tuple = ("doc_id",)):
    """Per-row EXACT percent rank within its group WITHOUT a sort:
    ``pct_bp = (#rows in the group with a strictly smaller value) *
    10000 // group size`` — SQL's ``(rank() - 1) * 10000 //
    count(*)`` window, the primitive behind percentile-bucketed
    quality gates ("keep the top decile per language").

    A distributed window function is normally a full sort exchange
    plus carried block offsets; like ``grouped_quantiles`` this trades
    that for a mergeable (key, value, count) histogram — valid when
    the value domain is bounded discrete (lengths, token counts,
    integer scores).  Pass 1 ships per-block histogram partials (<=
    |domain| rows per block), the merged histogram (groups x distinct
    values) is collected once and broadcast by closure capture; pass 2
    is an exchange-free streaming map over the original rows.
    """
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

    rows = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby([key_col, value_col])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    # per key: sorted distinct values + count of rows strictly below
    # each, as parallel arrays for a vectorized searchsorted probe
    per_key: dict = {}
    for r in rows:
        per_key.setdefault(r[key_col], []).append((r[value_col], r["cnt"]))
    lookup = {}
    for key, vc in per_key.items():
        vc.sort()
        vals = np.array([v for v, _ in vc], dtype=np.int64)
        cnts = np.array([c for _, c in vc], dtype=np.int64)
        below = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        lookup[key] = (vals, below, int(cnts.sum()))

    def rank(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        out = np.zeros(len(batch), dtype=np.int64)
        for key in np.unique(keys):
            m = keys == key
            kv, below, n = lookup[key]
            idx = np.searchsorted(kv, vals[m])
            out[m] = below[idx] * 10_000 // n
        cols = {c: batch.column(c) for c in id_cols}
        cols[key_col] = batch.column(key_col)
        cols[value_col] = batch.column(value_col)
        cols["pct_bp"] = pa.array(out)
        return pa.table(cols)

    return ds.map_batches(rank, batch_format="pyarrow",
                          zero_copy_batch=True)
