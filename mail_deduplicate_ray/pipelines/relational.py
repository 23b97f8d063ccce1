"""Relational/stream-shaped operators over the events + TPC-H-ish tables.

Demonstrates the generic groupby / window / top-k surface of the engine on
non-clip tables; all outputs are integer-typed so value hashes match the
DuckDB oracles bit-for-bit (float sums are order-dependent across engines).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mail_deduplicate_ray.sources.clips_io import read_parquet_clean

_US_PER_5MIN = 300 * 1_000_000


def events_window_5m(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 5-minute window per user: partial-aggregate inside
    map_batches (one row per (user, window) per batch) then a tiny final
    groupby — the streaming-window pattern from SURVEY.md §2.9 re-expressed
    batch-first."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        win = pc.divide(pc.cast(t["ts"], pa.int64()), _US_PER_5MIN)
        t = pa.table({"user_id": t["user_id"],
                      "window_id": pc.cast(win, pa.int64())})
        g = t.group_by(["user_id", "window_id"]).aggregate([("user_id", "count")])
        return pa.table({"user_id": g["user_id"], "window_id": g["window_id"],
                         "n": pc.cast(g["user_id_count"], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    out = partials.groupby(["user_id", "window_id"]).aggregate(
        Sum("n", alias_name="n_events"))
    return out.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "window_id": t["window_id"],
                            "n_events": pc.cast(t["n_events"], pa.int64())}),
        batch_format="pyarrow")


def keep_oldest_per_user(sf_dir: str) -> "ray.data.Dataset":
    """select-oldest (X2) over each user's events: rows with ts == group
    min, ties kept (ref: strategy.py:72-83)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts"])

    def per_group(g: pa.Table) -> pa.Table:
        mn = pc.min(g["ts"])
        return g.filter(pc.equal(g["ts"], mn)).select(["user_id", "event_id"])

    return ds.groupby("user_id").map_groups(per_group, batch_format="pyarrow")


def lineitem_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-shaped aggregate, integer-exact (cents)."""
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_shipdate"])

    cutoff = pa.scalar(pc.strptime("1998-09-02", "%Y-%m-%d", "us").as_py())

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        qty = pc.cast(t["l_quantity"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        t = pa.table({"l_returnflag": t["l_returnflag"],
                      "l_linestatus": t["l_linestatus"],
                      "qty": qty, "cents": cents})
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("cents", "sum"), ("qty", "count")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "qty": g["qty_sum"], "cents": g["cents_sum"],
            "n": pc.cast(g["qty_count"], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": [g["l_returnflag"][0].as_py()],
            "l_linestatus": [g["l_linestatus"][0].as_py()],
            "sum_qty": pa.array([pc.sum(g["qty"]).as_py()], pa.int64()),
            "sum_price_cents": pa.array([pc.sum(g["cents"]).as_py()],
                                        pa.int64()),
            "count_order": pa.array([pc.sum(g["n"]).as_py()], pa.int64()),
        })

    return partials.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        final, batch_format="pyarrow")


def events_sessions(sf_dir: str, gap_s: int = 1800) -> "ray.data.Dataset":
    """Session windows per user (gap > ``gap_s`` starts a new session):
    groupby(user) -> sort-by-ts inside the group -> cumulative gap count
    (the streaming-shaped pattern from SURVEY.md §2.9: ordered, partitioned
    log + per-group windowing; ordering assumption: ts within one user fits
    one group).  Output: one row per session with integer-exact bounds."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts"])

    def per_user(g):
        import pandas as pd
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("int64")  # epoch us
        new = (us.diff() > gap_s * 1_000_000).fillna(True)
        sid = new.cumsum()
        out = g.assign(__sid=sid, __us=us).groupby("__sid").agg(
            user_id=("user_id", "first"),
            session_start_us=("__us", "min"),
            session_end_us=("__us", "max"),
            n_events=("event_id", "count"),
        )
        return pd.DataFrame({
            "user_id": out["user_id"].astype("int64"),
            "session_start_us": out["session_start_us"].astype("int64"),
            "session_end_us": out["session_end_us"].astype("int64"),
            "n_events": out["n_events"].astype("int64"),
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def events_per_day(sf_dir: str) -> "ray.data.Dataset":
    """Date normalization (M4, ref: mail.py:567-576) + native Ray
    aggregate: events per UTC day via groupby().aggregate(Count)."""
    from ray.data.aggregate import Count

    from mail_deduplicate_ray.functions.normalize import normalize_date

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])
    days = ds.map_batches(
        lambda t: pa.table({"day": normalize_date(t["ts"])}),
        batch_format="pyarrow")
    out = days.groupby("day").aggregate(Count(alias_name="n_events"))
    return out.map_batches(
        lambda t: pa.table({"day": t["day"],
                            "n_events": pc.cast(t["n_events"], pa.int64())}),
        batch_format="pyarrow")


def orders_by_status(sf_dir: str) -> "ray.data.Dataset":
    """Native Ray aggregates (Sum/Min/Max) over integer cents."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                               columns=["o_orderstatus", "o_totalprice"])
    cents = ds.map_batches(
        lambda t: pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                                      round_mode="half_towards_infinity"),
                             pa.int64())}),
        batch_format="pyarrow")
    out = cents.groupby("o_orderstatus").aggregate(
        Count(alias_name="n_orders"),
        Sum("cents", alias_name="total_cents"),
        Min("cents", alias_name="min_cents"),
        Max("cents", alias_name="max_cents"))
    return out.map_batches(
        lambda t: pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
            "total_cents": pc.cast(t["total_cents"], pa.int64()),
            "min_cents": pc.cast(t["min_cents"], pa.int64()),
            "max_cents": pc.cast(t["max_cents"], pa.int64())}),
        batch_format="pyarrow")


def top_spenders(sf_dir: str, k: int = 25) -> "ray.data.Dataset":
    """Global top-k (sort + limit): customers by total order cents."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        t = pa.table({"o_custkey": t["o_custkey"], "cents": cents})
        g = t.group_by("o_custkey").aggregate([("cents", "sum")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "total_cents": g["cents_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": [g["o_custkey"][0].as_py()],
            "total_cents": pa.array([pc.sum(g["total_cents"]).as_py()],
                                    pa.int64())})

    totals = partials.groupby("o_custkey").map_groups(
        final, batch_format="pyarrow")
    return totals.sort(["total_cents", "o_custkey"], descending=[True, False]) \
                 .limit(k)
