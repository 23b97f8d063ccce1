"""Bucketed group processing — the scale-critical shuffle idiom.

A naive ``ds.groupby(key).map_groups(fn)`` with millions of distinct keys
pays a per-group Python call and shuffles on wide string keys.  Instead we
hash the key into ``nbuckets`` small integers, shuffle on the int bucket,
and process ALL keys of a bucket in ONE partition call with a vectorized
pandas/pyarrow body.  Shuffle cost: O(rows) on an int key; Python overhead:
O(nbuckets), not O(distinct keys).  This is the explicit partitioned
hash-join/aggregate pattern for every wide step in the engine.

Hashing uses ``pandas.util.hash_array`` — deterministic across processes
and vectorized (cluster-size independent results).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

BUCKET_COL = "__bucket"


def pool_size(frac: float = 1.0, lo: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: (1, frac x CPUs).
    Pools hard-capped at a constant starve large sessions — size to the
    node (ray_guide: 'concurrency x num_cpus so the pool fits the node')."""
    import ray
    try:
        # guard: cluster_resources() would AUTO-INIT Ray if none is up —
        # the driver contract forbids the library starting a session
        ncpu = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
    except Exception:  # noqa: BLE001
        ncpu = 8
    return (lo, max(2, int(ncpu * frac)))


def default_nbuckets() -> int:
    """Join/partition bucket count sized to the cluster: ~1 bucket per 2
    CPUs (each bucket is one merge task; more buckets at this data scale
    just buys per-task overhead, measured 64->16 halving join wall time
    at sf0.1, while a 256-node cluster resolves to thousands)."""
    _, hi = pool_size()
    return max(8, hi // 2)


def hash_to_buckets(values, nbuckets: int) -> np.ndarray:
    """Deterministic vectorized hash of any array-like -> int32 buckets."""
    arr = np.asarray(values, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(nbuckets)).astype(np.int32)


def add_bucket(ds: "ray.data.Dataset", key: str,
               nbuckets: int) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        b = hash_to_buckets(t[key].to_pylist(), nbuckets)
        return t.append_column(BUCKET_COL, pa.array(b, pa.int32()))
    return ds.map_batches(f, batch_format="pyarrow")


def arrow_clean(df: pd.DataFrame) -> pa.Table:
    """pandas → Arrow with the schema metadata STRIPPED.  Conversion via
    ``from_pandas`` attaches a b'pandas' metadata dict, which makes the
    schema unhashable and defeats Ray's schema-dedup ("Failed to hash the
    schemas" warnings on every downstream unify) — map_groups bodies that
    build pandas frames should return through this."""
    return pa.Table.from_pandas(
        df, preserve_index=False).replace_schema_metadata(None)


def grouped(ds: "ray.data.Dataset", key: str, part_fn: Callable,
            nbuckets: int | None = None,
            batch_format: str = "pandas") -> "ray.data.Dataset":
    """groupby(key) via bucketed partitions.

    ``part_fn(df)`` receives one partition containing ALL rows of every key
    hashed to that bucket (the ``__bucket`` column is already dropped) and
    returns a DataFrame/Table; it is responsible for its own per-key logic
    (typically a vectorized ``df.groupby(key)``).  ``nbuckets=None``
    resolves to ``default_nbuckets()`` (cluster-sized).
    """
    bucketed = add_bucket(ds, key, nbuckets or default_nbuckets())

    if batch_format == "pandas":
        def runner(df: pd.DataFrame) -> pa.Table:
            out = part_fn(df.drop(columns=[BUCKET_COL]))
            if isinstance(out, pd.DataFrame):
                return arrow_clean(out)
            return out
    else:
        def runner(t: pa.Table) -> pa.Table:
            return part_fn(t.drop_columns([BUCKET_COL]))

    return bucketed.groupby(BUCKET_COL).map_groups(
        runner, batch_format=batch_format)


def per_key_apply(key: str, fn: Callable[[pd.DataFrame], pd.DataFrame]):
    """Partition body: apply ``fn`` to each key-group inside the bucket
    (for logic that is inherently per-group, e.g. the settle cascade)."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        outs = [fn(g) for _, g in df.groupby(key, sort=True)]
        return pd.concat(outs, ignore_index=True) if outs else df.iloc[0:0]
    return part


def grouped_multi(ds: "ray.data.Dataset", keys: list[str],
                  part_fn: Callable,
                  nbuckets: int | None = None) -> "ray.data.Dataset":
    """``grouped`` for COMPOSITE keys: rows are routed by a fused u64
    hash of the key columns (vectorized hash_array per column, mixed by
    a rotate-xor — any deterministic function of the key tuple is an
    exact router, since ``part_fn``'s own in-bucket groupby does the
    real grouping).  Replaces ``ds.groupby([k1, k2]).aggregate(...)``,
    whose sort-based shuffle measured ~11x slower than the int-bucket
    hash shuffle on the hopping-window partials (8.9 s -> 0.8 s at
    sf0.1, 32 CPUs).  ``part_fn(df)`` sees the original columns only."""
    nb = nbuckets or default_nbuckets()

    def add_key(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in keys:
            hk = pd.util.hash_array(
                t[k].combine_chunks().to_numpy(zero_copy_only=False))
            h = ((h << np.uint64(13)) | (h >> np.uint64(51))) ^ hk
        b = (h % np.uint64(nb)).astype(np.int32)
        return t.append_column(BUCKET_COL, pa.array(b, pa.int32()))

    bucketed = ds.map_batches(add_key, batch_format="pyarrow")

    def runner(df: pd.DataFrame) -> pa.Table:
        out = part_fn(df.drop(columns=[BUCKET_COL]))
        if isinstance(out, pd.DataFrame):
            return arrow_clean(out)
        return out

    return bucketed.groupby(BUCKET_COL).map_groups(
        runner, batch_format="pandas")


def grouped_sum(ds: "ray.data.Dataset", keys: list[str],
                col_map: dict[str, str],
                nbuckets: int | None = None) -> "ray.data.Dataset":
    """Composite-key partial-sum merge: ``grouped_multi`` with a
    vectorized in-bucket ``groupby(keys).sum()`` over the ``col_map``
    input columns, renamed to the mapped output names — the drop-in
    replacement for ``ds.groupby(keys).aggregate(Sum(...))`` on
    pre-aggregated partials."""
    cols = list(col_map)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False)[cols].sum()
        return g.rename(columns=col_map)

    return grouped_multi(ds, keys, part, nbuckets)
