"""Distributed joins — the two physical shapes that survive 100 TB.

The reference has no relational joins (SURVEY.md §2.6: its only
lookup-shaped operator is the cache anti-join, ref: cache.py:265-296);
these close the gap for the engine's general data-processing surface and
re-use the same two scale idioms the dedup core is built on:

- ``broadcast_join``: the build side is ``ray.put`` ONCE and every probe
  task resolves it from the local object store (zero-copy Plasma read, not
  re-shipped per batch); the probe side streams through a task map doing a
  vectorized ``pc.index_in`` + ``take``.  No shuffle at all.  Right for
  dimension tables that fit a worker heap at any corpus scale.
- ``shuffle_join``: both sides are hash-bucketed on the key into small
  INT bucket ids (the ``bucketing`` idiom — shuffle moves int32 keys, and
  Python overhead is O(buckets), not O(distinct keys)), unioned with a
  side tag, moved by ONE ``groupby(bucket)`` shuffle, and joined locally
  per bucket with a vectorized pandas merge.  Right for fact × fact.

``semi_anti_join`` ships only the DISTINCT keys of the filter side
(per-batch ``pc.unique`` before the shuffle), so the filter side's payload
never moves — the generalization of the checkpoint anti-join
(state/checkpoint.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from mail_deduplicate_ray.stages.bucketing import (BUCKET_COL, add_bucket,
                                                   arrow_clean,
                                                   default_nbuckets)

_SIDE_COL = "__side"


def _pa_schema(ds: "ray.data.Dataset") -> pa.Schema:
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(sch.names, sch.types)))


def broadcast_join(probe: "ray.data.Dataset", build: pa.Table,
                   left_key: str, right_key: str,
                   how: str = "inner") -> "ray.data.Dataset":
    """Join ``probe`` (streaming Dataset) against a small in-memory build
    table.  ``how`` ∈ {inner, left, semi, anti}.  For inner/left every
    build column except the key is appended to the probe rows; semi/anti
    only filter.  The build table crosses the cluster once (``ray.put``);
    each task's ``ray.get`` is a node-local zero-copy handle.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    build = build.combine_chunks()
    if pc.count_distinct(build[right_key]).as_py() != build.num_rows:
        raise ValueError(f"broadcast_join build side has duplicate "
                         f"{right_key!r} keys")
    ref = ray.put(build)
    payload_cols = [c for c in build.column_names if c != right_key]

    def probe_fn(t: pa.Table) -> pa.Table:
        tbl = ray.get(ref)
        idx = pc.index_in(t[left_key], value_set=tbl[right_key])
        matched = pc.is_valid(idx)
        if how == "anti":
            return t.filter(pc.invert(matched))
        if how == "semi":
            return t.filter(matched)
        if how == "inner":
            t = t.filter(matched)
            idx = idx.filter(matched)
        # null indices under how="left" take() to null payload values
        for c in payload_cols:
            t = t.append_column(c, tbl[c].take(idx))
        return t

    return probe.map_batches(probe_fn, batch_format="pyarrow")


def _tagged(ds: "ray.data.Dataset", key: str, out_key: str,
            own_cols: list[tuple[str, pa.DataType]],
            other_cols: list[tuple[str, pa.DataType]],
            order: list[str], side: int) -> "ray.data.Dataset":
    """Project ``ds`` onto the union schema: own columns kept, the other
    side's columns appended as typed nulls, plus the side tag."""
    def f(t: pa.Table) -> pa.Table:
        cols = {out_key: t[key]}
        for name, _ in own_cols:
            cols[name] = t[name]
        for name, typ in other_cols:
            cols[name] = pa.nulls(t.num_rows, typ)
        cols[_SIDE_COL] = pa.array([side] * t.num_rows, pa.int8())
        return pa.table({n: cols[n] for n in order})
    return ds.map_batches(f, batch_format="pyarrow")


def shuffle_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                 left_key: str, right_key: str, how: str = "inner",
                 nbuckets: int | None = None,
                 salt: int = 1) -> "ray.data.Dataset":
    """Partitioned hash join of two Datasets on one key.

    Both sides are tagged and projected onto the union schema (the
    missing side's columns become typed null arrays — Arrow null columns
    are O(1) in the shuffle), bucketed on the key, and merged per bucket
    with pandas.  ``how`` ∈ {inner, left}.  Output key column keeps the
    LEFT name; non-key column names must be disjoint across sides.

    ``salt > 1`` is the HOT-KEY escape hatch: left rows spread across
    ``salt`` sub-buckets (round-robin within each batch — assignment is
    partitioning-dependent but the join result is not), while the right
    side is replicated into every sub-bucket, so one mega-key's pair
    work parallelizes ``salt``-ways at the cost of shipping the right
    side ``salt`` times.  Use when the left is skewed and the right is
    the smaller side (same trade as the candidate-bucket salting in
    stages/candidates.py).
    """
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import hash_to_buckets

    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    nbuckets = nbuckets or default_nbuckets()
    lsch, rsch = _pa_schema(left), _pa_schema(right)
    lcols = [(n, lsch.field(n).type) for n in lsch.names if n != left_key]
    rcols = [(n, rsch.field(n).type) for n in rsch.names if n != right_key]
    overlap = {n for n, _ in lcols} & {n for n, _ in rcols}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    order = ([left_key] + [n for n, _ in lcols] + [n for n, _ in rcols]
             + [_SIDE_COL])
    lt = _tagged(left, left_key, left_key, lcols, rcols, order, 0)
    rt = _tagged(right, right_key, left_key, rcols, lcols, order, 1)
    if salt == 1:
        both = add_bucket(lt.union(rt), left_key, nbuckets)
    else:
        def bucket_salted_left(t: pa.Table) -> pa.Table:
            base = hash_to_buckets(t[left_key].to_pylist(),
                                   nbuckets).astype(np.int64)
            s = np.arange(t.num_rows, dtype=np.int64) % salt
            return t.append_column(
                BUCKET_COL, pa.array(base * salt + s, pa.int32()))

        def bucket_replicated_right(t: pa.Table) -> pa.Table:
            base = hash_to_buckets(t[left_key].to_pylist(),
                                   nbuckets).astype(np.int64)
            return pa.concat_tables([
                t.append_column(BUCKET_COL,
                                pa.array(base * salt + sv, pa.int32()))
                for sv in range(salt)])

        both = (lt.map_batches(bucket_salted_left, batch_format="pyarrow")
                .union(rt.map_batches(bucket_replicated_right,
                                      batch_format="pyarrow")))

    lnames = [left_key] + [n for n, _ in lcols]
    rnames = [left_key] + [n for n, _ in rcols]

    def part(df):
        df = df.drop(columns=[BUCKET_COL])
        l = df[df[_SIDE_COL] == 0][lnames]
        r = df[df[_SIDE_COL] == 1][rnames]
        out = l.merge(r, on=left_key, how=how)
        return arrow_clean(out)

    return both.groupby(BUCKET_COL).map_groups(part, batch_format="pandas")


def semi_anti_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                   left_key: str, right_key: str, anti: bool = False,
                   nbuckets: int | None = None) -> "ray.data.Dataset":
    """Distributed semi (``anti=False``) / anti (``anti=True``) join:
    keep left rows whose key does (not) appear in ``right``.  Only the
    DISTINCT keys of the right side enter the shuffle (per-batch
    ``pc.unique``), so the filter side's payload never moves."""
    nbuckets = nbuckets or default_nbuckets()
    lsch = _pa_schema(left)
    lcols = [(n, lsch.field(n).type) for n in lsch.names if n != left_key]
    order = [left_key] + [n for n, _ in lcols] + [_SIDE_COL]

    def rkeys(t: pa.Table) -> pa.Table:
        u = pc.unique(t[right_key])
        cols = {left_key: u}
        for n, typ in lcols:
            cols[n] = pa.nulls(len(u), typ)
        cols[_SIDE_COL] = pa.array([1] * len(u), pa.int8())
        return pa.table({n: cols[n] for n in order})

    lt = _tagged(left, left_key, left_key, lcols, [], order, 0)
    rt = right.map_batches(rkeys, batch_format="pyarrow")
    both = add_bucket(lt.union(rt), left_key, nbuckets)
    lnames = [left_key] + [n for n, _ in lcols]

    def part(df):
        df = df.drop(columns=[BUCKET_COL])
        l = df[df[_SIDE_COL] == 0][lnames]
        present = l[left_key].isin(df[df[_SIDE_COL] == 1][left_key])
        out = l[~present] if anti else l[present]
        return arrow_clean(out)

    return both.groupby(BUCKET_COL).map_groups(part, batch_format="pandas")


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key: str, on: str,
              nbuckets: int | None = None) -> "ray.data.Dataset":
    """Backward as-of join — each left row is matched to the right row
    with the greatest ``on`` <= the left row's ``on`` within the same
    ``key`` (the windowed-lookup operator Ray Data lacks; DuckDB's
    ``ASOF JOIN`` is the oracle).  Composition: side-tagged union ->
    ONE bucket-by-key shuffle -> per-partition ``pandas.merge_asof``
    (vectorized C merge over sorted frames).

    LEFT-join semantics: unmatched rows keep null right columns.
    Partitioning assumption (SURVEY.md: custom operators document their
    key): all rows of one ``key`` value fit one bucket partition.
    Both sides must share ``key``/``on`` names; other column names must
    be disjoint.  The right side's ``on`` is not carried over — copy it
    into a payload column first if the match timestamp is needed.
    """
    import pandas as pd

    nbuckets = nbuckets or default_nbuckets()
    lsch, rsch = _pa_schema(left), _pa_schema(right)
    shared = (key, on)
    lcols = [(n, lsch.field(n).type) for n in lsch.names if n not in shared]
    rcols = [(n, rsch.field(n).type) for n in rsch.names if n not in shared]
    overlap = {n for n, _ in lcols} & {n for n, _ in rcols}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    on_type = lsch.field(on).type
    fields = ([(key, lsch.field(key).type), (on, on_type)]
              + lcols + rcols)
    order = [n for n, _ in fields] + [_SIDE_COL]

    def project(side: int, own, other):
        def f(t: pa.Table) -> pa.Table:
            cols = {key: t[key], on: t[on]}
            for n, _ in own:
                cols[n] = t[n]
            for n, typ in other:
                cols[n] = pa.nulls(t.num_rows, typ)
            cols[_SIDE_COL] = pa.array([side] * t.num_rows, pa.int8())
            return pa.table({n: cols[n] for n in order})
        return f

    lt = left.map_batches(project(0, lcols, rcols), batch_format="pyarrow")
    rt = right.map_batches(project(1, rcols, lcols), batch_format="pyarrow")
    both = add_bucket(lt.union(rt), key, nbuckets)

    lnames = [key, on] + [n for n, _ in lcols]
    rnames = [key, on] + [n for n, _ in rcols]

    def to_schema(df) -> pa.Table:
        return pa.table({n: pa.Array.from_pandas(df[n], type=typ)
                         for n, typ in fields})

    def part(df):
        df = df.drop(columns=[BUCKET_COL])
        l = df[df[_SIDE_COL] == 0][lnames]
        # null `on` values: right rows can never match (no position on the
        # timeline); left rows pass through unmatched — mirrors the
        # MissingTimestamps null fall-through, never an exception
        l_null = l[l[on].isna()]
        l = l[l[on].notna()].sort_values(on, kind="mergesort")
        r = (df[(df[_SIDE_COL] == 1) & df[on].notna()][rnames]
             .sort_values(on, kind="mergesort"))
        if len(l) == 0 or len(r) == 0:
            out = pd.concat([l, l_null], ignore_index=True)
            for n, _ in rcols:
                out[n] = None
            return to_schema(out)
        out = pd.merge_asof(l, r, on=on, by=key, direction="backward",
                            allow_exact_matches=True)
        if len(l_null):
            nulls = l_null.copy()
            for n, _ in rcols:
                nulls[n] = None
            out = pd.concat([out, nulls], ignore_index=True)
        return to_schema(out)

    return both.groupby(BUCKET_COL).map_groups(part, batch_format="pandas")
