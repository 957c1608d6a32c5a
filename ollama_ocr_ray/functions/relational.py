"""Relational operators over the TPC-H-ish tables: grouped aggregation
with partial pre-aggregation, broadcast join, top-k, windowed aggregate.

Float-sum determinism: monetary doubles are scaled to exact integers
(``floor(x*100 + 0.5)``) before summing, so the engine's partial-sum
order and DuckDB's sequential order produce bit-identical results; the
final divide back to doubles is a single identical operation on both
sides.  The SQL oracles mirror the same scaling expressions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col) -> pa.Array:
    """floor(x*100 + 0.5) as int64 — exactly mirrors the SQL oracle."""
    x = col.to_numpy(zero_copy_only=False)
    return pa.array(np.floor(x * 100.0 + 0.5).astype(np.int64))


def pricing_summary(lineitem):
    """TPC-H Q1-shaped pricing summary.

    Partial aggregation per batch (6 groups max per partial) → tiny
    groupby exchange → finalize.  Never shuffles raw lineitem rows.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": batch.column("l_quantity").cast(pa.int64()),
                "base_cents": pa.array(
                    np.floor(ep * 100.0 + 0.5).astype(np.int64)
                ),
                "disc_dm": pa.array(
                    np.floor(ep * (1.0 - disc) * 10000.0 + 0.5).astype(np.int64)
                ),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"), ("disc_dm", "sum"),
             ("one", "sum")]
        )

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_sum", alias_name="sum_qty"),
        Sum("base_cents_sum", alias_name="base_cents"),
        Sum("disc_dm_sum", alias_name="disc_dm"),
        Sum("one_sum", alias_name="count_order"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        sum_qty = batch.column("sum_qty").to_numpy(zero_copy_only=False)
        cents = batch.column("base_cents").to_numpy(zero_copy_only=False)
        dm = batch.column("disc_dm").to_numpy(zero_copy_only=False)
        n = batch.column("count_order").to_numpy(zero_copy_only=False)
        sum_base = cents / 100.0
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": pa.array(sum_qty, type=pa.int64()),
                "sum_base_price": pa.array(sum_base),
                "sum_disc_price": pa.array(dm / 10000.0),
                "avg_qty": pa.array(sum_qty / n),
                "avg_price": pa.array(sum_base / n),
                "count_order": pa.array(n, type=pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def segment_revenue(orders, customer_lookup: dict):
    """orders ⋈ customer (broadcast) → per-market-segment totals.

    ``customer_lookup`` (custkey → mktsegment) is the small side: built
    once driver-side, shipped to tasks via closure capture (Ray stores
    it once in the object store; real clusters would ray.put it) — no
    shuffle join.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        seg = np.array([customer_lookup.get(int(c), "UNKNOWN") for c in cust],
                       dtype=object)
        t = pa.table(
            {
                "c_mktsegment": pa.array(seg, type=pa.string()),
                "price_cents": _cents(batch.column("o_totalprice")),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by("c_mktsegment").aggregate(
            [("price_cents", "sum"), ("one", "sum")]
        )

    partials = orders.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("price_cents_sum", alias_name="cents"),
        Sum("one_sum", alias_name="n_orders"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "n_orders": batch.column("n_orders").cast(pa.int64()),
                "total_revenue": pa.array(
                    batch.column("cents").to_numpy(zero_copy_only=False) / 100.0
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def top_docs_by_len(docs, k: int = 100):
    """Top-k documents by n_chars (desc), doc_id tie-break — a
    distributed sort + limit (Ray samples a boundary partitioning, only
    the head partitions materialize under the limit)."""
    return docs.sort(
        ["n_chars", "doc_id"], descending=[True, False]
    ).limit(k).select_columns(["doc_id", "n_chars"])


def events_hourly(events):
    """Tumbling 1-hour windows per event_type: row count, distinct
    users, exact sum(value) via 1e6 scaling.

    Window key is computed vectorized; the groupby is the one exchange.
    (Distinct-user exact counting shuffles (key, user) rows — the scale
    path swaps in an HLL sketch partial; exact is right at test sizes.)
    """

    def add_window(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        ts = batch.column("ts")
        win = pc.floor_temporal(ts, unit="hour")
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": win,
                "user_id": batch.column("user_id"),
                "value_micro": pa.array(
                    np.floor(v * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    rows = events.map_batches(add_window, batch_format="pyarrow")

    def per_group(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        micro = group.column("value_micro").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": group.column("event_type").slice(0, 1),
                "window_start": group.column("window_start").slice(0, 1),
                "n_events": pa.array([len(group)], type=pa.int64()),
                "n_users": pa.array([len(np.unique(users))], type=pa.int64()),
                "sum_value": pa.array([float(np.sum(micro)) / 1e6]),
            }
        )

    return rows.groupby(["event_type", "window_start"]).map_groups(
        per_group, batch_format="pyarrow"
    )
