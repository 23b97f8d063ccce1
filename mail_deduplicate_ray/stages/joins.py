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


def _tagged(ds: "ray.data.Dataset", shared: list[tuple[str, str]],
            own_cols: list[tuple[str, pa.DataType]],
            other_cols: list[tuple[str, pa.DataType]],
            order: list[str], side: int) -> "ray.data.Dataset":
    """Project ``ds`` onto the union schema: ``shared`` columns renamed
    ``(out_name, in_name)``, own columns kept, the other side's columns
    appended as typed nulls, plus the side tag."""
    def f(t: pa.Table) -> pa.Table:
        cols = {out: t[src] for out, src in shared}
        for name, _ in own_cols:
            cols[name] = t[name]
        for name, typ in other_cols:
            cols[name] = pa.nulls(t.num_rows, typ)
        cols[_SIDE_COL] = pa.array([side] * t.num_rows, pa.int8())
        return pa.table({n: cols[n] for n in order})
    return ds.map_batches(f, batch_format="pyarrow")


def _as_keys(k) -> list[str]:
    return [k] if isinstance(k, str) else list(k)


def _combined_buckets(t: pa.Table, keys: list[str],
                      nbuckets: int) -> "np.ndarray":
    """Deterministic int32 bucket over one or more key columns (matching
    rows agree on every key, so any combine of per-column hashes
    co-locates them; combining ALL keys avoids the skew of bucketing on
    just the first)."""
    import numpy as np

    from mail_deduplicate_ray.stages.bucketing import hash_to_buckets

    h = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        hk = (hash_to_buckets(t[k].to_pylist(), 1 << 31)
              .astype(np.uint64))
        h = h * np.uint64(0x9E3779B97F4A7C15) + hk
    return (h % np.uint64(nbuckets)).astype(np.int32)


def shuffle_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                 left_key: "str | list[str]", right_key: "str | list[str]",
                 how: str = "inner", nbuckets: int | None = None,
                 salt: int = 1) -> "ray.data.Dataset":
    """Partitioned hash join of two Datasets on one key or a composite
    key (pass parallel lists; output keeps the LEFT names).

    Both sides are tagged and projected onto the union schema (the
    missing side's columns become typed null arrays — Arrow null columns
    are O(1) in the shuffle), bucketed on the key, and merged per bucket
    with pandas.  ``how`` ∈ {inner, left, full}.  Output key column keeps
    the LEFT name; non-key column names must be disjoint across sides.
    SQL null semantics throughout: a NULL key matches nothing, but
    null-key rows pass through unmatched on left (and on both sides for
    full outer).

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

    if how not in ("inner", "left", "full"):
        raise ValueError(f"unsupported how={how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how == "full" and salt != 1:
        # replicated right rows would emit one unmatched copy per salt
        raise ValueError("full outer join cannot be salted")
    nbuckets = nbuckets or default_nbuckets()
    lkeys, rkeys = _as_keys(left_key), _as_keys(right_key)
    if len(lkeys) != len(rkeys):
        raise ValueError("left/right key lists must have equal length")
    lsch, rsch = _pa_schema(left), _pa_schema(right)
    for lk, rk in zip(lkeys, rkeys):
        if lsch.field(lk).type != rsch.field(rk).type:
            raise ValueError(
                f"join key type mismatch: {lk}={lsch.field(lk).type}"
                f" vs {rk}={rsch.field(rk).type}")
    lcols = [(n, lsch.field(n).type) for n in lsch.names if n not in lkeys]
    rcols = [(n, rsch.field(n).type) for n in rsch.names if n not in rkeys]
    overlap = ({n for n, _ in lcols} & {n for n, _ in rcols}) \
        | (set(lkeys) & {n for n, _ in rcols})
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    order = (lkeys + [n for n, _ in lcols] + [n for n, _ in rcols]
             + [_SIDE_COL])
    fields = ([(k, lsch.field(k).type) for k in lkeys] + lcols + rcols)
    lt = _tagged(left, list(zip(lkeys, lkeys)), lcols, rcols, order, 0)
    rt = _tagged(right, list(zip(lkeys, rkeys)), rcols, lcols, order, 1)
    if salt == 1:
        def bucket_plain(t: pa.Table) -> pa.Table:
            return t.append_column(
                BUCKET_COL,
                pa.array(_combined_buckets(t, lkeys, nbuckets), pa.int32()))
        both = lt.union(rt).map_batches(bucket_plain,
                                        batch_format="pyarrow")
    else:
        def bucket_salted_left(t: pa.Table) -> pa.Table:
            base = _combined_buckets(t, lkeys, nbuckets).astype(np.int64)
            s = np.arange(t.num_rows, dtype=np.int64) % salt
            return t.append_column(
                BUCKET_COL, pa.array(base * salt + s, pa.int32()))

        def bucket_replicated_right(t: pa.Table) -> pa.Table:
            base = _combined_buckets(t, lkeys, nbuckets).astype(np.int64)
            return pa.concat_tables([
                t.append_column(BUCKET_COL,
                                pa.array(base * salt + sv, pa.int32()))
                for sv in range(salt)])

        both = (lt.map_batches(bucket_salted_left, batch_format="pyarrow")
                .union(rt.map_batches(bucket_replicated_right,
                                      batch_format="pyarrow")))

    def part(t: pa.Table) -> pa.Table:
        # Index-frame merge: ONLY (key, position) crosses into pandas
        # (Arrow-backed dtypes, exact for any int64); payload columns are
        # assembled by Arrow `take`, so int64 >= 2^53 survives, nulls stay
        # typed, and empty partitions keep their declared schema.  A
        # whole-partition pandas conversion would silently round large
        # ints through float64 (the typed-null union columns force it).
        import numpy as np
        import pandas as pd

        t = t.drop_columns([BUCKET_COL])
        lmask = pc.equal(t[_SIDE_COL], 0)
        l_tbl = t.filter(lmask)
        r_tbl = t.filter(pc.invert(lmask))
        # SQL join semantics: a NULL key never matches anything (pandas
        # merge would match NaN/NA to NA); null-key left rows drop on
        # inner / pass through unmatched on left
        def all_valid(tbl: pa.Table):
            m = pc.is_valid(tbl[lkeys[0]])
            for k in lkeys[1:]:
                m = pc.and_(m, pc.is_valid(tbl[k]))
            return m

        lv = all_valid(l_tbl)
        l_ok = l_tbl.filter(lv)
        l_null = (l_tbl.filter(pc.invert(lv))
                  if how in ("left", "full") else None)
        rv = all_valid(r_tbl)
        r_null = r_tbl.filter(pc.invert(rv)) if how == "full" else None
        r_tbl = r_tbl.filter(rv)

        lf = l_ok.select(lkeys).to_pandas(types_mapper=pd.ArrowDtype)
        lf["__il"] = np.arange(len(lf), dtype=np.int64)
        rf = r_tbl.select(lkeys).to_pandas(types_mapper=pd.ArrowDtype)
        rf["__ir"] = np.arange(len(rf), dtype=np.int64)
        m = lf.merge(rf, on=lkeys,
                     how="outer" if how == "full" else how)
        li = pa.Array.from_pandas(m["__il"], type=pa.int64())
        ri = pa.Array.from_pandas(m["__ir"], type=pa.int64())
        if how == "full":
            # right-only rows have a null left index: take() would null
            # the keys, so rebuild them from the merged (exact ArrowDtype)
            # key frame instead
            cols = {k: pa.Array.from_pandas(m[k], type=lsch.field(k).type)
                    for k in lkeys}
        else:
            cols = {k: l_ok[k].take(li) for k in lkeys}
        for n, _ in lcols:
            cols[n] = l_ok[n].take(li)
        for n, _ in rcols:
            cols[n] = r_tbl[n].take(ri)
        out = pa.table({n: cols[n] for n, _ in fields})
        passthrough = []
        if l_null is not None and l_null.num_rows:
            nul = {k: l_null[k] for k in lkeys}
            for n, _ in lcols:
                nul[n] = l_null[n]
            for n, typ in rcols:
                nul[n] = pa.nulls(l_null.num_rows, typ)
            passthrough.append(pa.table({n: nul[n] for n, _ in fields}))
        if r_null is not None and r_null.num_rows:
            nul = {k: r_null[k] for k in lkeys}
            for n, typ in lcols:
                nul[n] = pa.nulls(r_null.num_rows, typ)
            for n, _ in rcols:
                nul[n] = r_null[n]
            passthrough.append(pa.table({n: nul[n] for n, _ in fields}))
        if passthrough:
            out = pa.concat_tables([out, *passthrough])
        return out

    return both.groupby(BUCKET_COL).map_groups(part, batch_format="pyarrow")


def semi_anti_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                   left_key: str, right_key: str, anti: bool = False,
                   nbuckets: int | None = None,
                   bloom_bits: int | None = None) -> "ray.data.Dataset":
    """Distributed semi (``anti=False``) / anti (``anti=True``) join:
    keep left rows whose key does (not) appear in ``right``.  Only the
    DISTINCT keys of the right side enter the shuffle (per-batch
    ``pc.unique``), so the filter side's payload never moves.

    ``bloom_bits`` (semi only) turns on a broadcast Bloom prefilter:
    per-batch partial filters over the right keys OR-merge on the driver
    (bloom_bits/8 bytes each), the merged filter ships once via ray.put,
    and left rows whose key is DEFINITELY absent drop before the shuffle
    — exact by construction (no false negatives), so the result is
    identical at any filter size; a too-small filter only loses the
    pruning.  The win at scale: when most probe keys miss, the shuffle
    moves survivors instead of the whole left side.  Anti joins cannot
    prefilter this way (a definitely-absent row must be EMITTED, which
    would fork the stream) — ``bloom_bits`` with ``anti=True`` raises.

    Null-key semantics are relational EXISTS / NOT EXISTS (matching
    ``broadcast_join`` and SQL joins): a null left key matches nothing,
    so semi drops it and anti keeps it; null right keys are ignored.
    (This is NOT the SQL ``NOT IN`` null trap.)
    """
    if bloom_bits and anti:
        raise ValueError("bloom prefilter is semi-only")
    nbuckets = nbuckets or default_nbuckets()
    lsch = _pa_schema(left)
    lcols = [(n, lsch.field(n).type) for n in lsch.names if n != left_key]
    order = [left_key] + [n for n, _ in lcols] + [_SIDE_COL]

    def rkeys(t: pa.Table) -> pa.Table:
        u = pc.unique(t[right_key]).drop_null()
        cols = {left_key: pc.cast(u, lsch.field(left_key).type)}
        for n, typ in lcols:
            cols[n] = pa.nulls(len(u), typ)
        cols[_SIDE_COL] = pa.array([1] * len(u), pa.int8())
        return pa.table({n: cols[n] for n in order})

    rt = right.map_batches(rkeys, batch_format="pyarrow")
    if bloom_bits:
        import numpy as np

        import ray as _ray

        from mail_deduplicate_ray.functions import bloom

        # the keys-only table is consumed twice (filter build + shuffle);
        # materialize so the right pipeline doesn't re-execute
        rt = rt.materialize()
        words = bloom.empty(bloom_bits)
        for b in rt.map_batches(
                lambda t, mb=bloom_bits: pa.table({"w": pa.array(
                    [bloom.add(bloom.empty(mb),
                               t[left_key].to_numpy(zero_copy_only=False)
                               ).tobytes()], pa.binary())}),
                batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
            for buf in b["w"].to_pylist():
                words |= np.frombuffer(buf, np.uint64)
        ref = _ray.put(words)

        def prefilter(t: pa.Table) -> pa.Table:
            w = _ray.get(ref)
            # drop null keys BEFORE to_numpy: a single null turns the
            # int64 column into float64, and the hash of 2.0 != hash of
            # 2 would false-negative EVERY key in the batch (semi drops
            # null keys anyway, so removing them here is semantics-
            # preserving)
            t = t.filter(pc.is_valid(t[left_key]))
            if t.num_rows == 0:
                return t
            vals = t[left_key].to_numpy(zero_copy_only=False)
            keep = bloom.contains(w, vals)
            return t.filter(pa.array(keep))

        left = left.map_batches(prefilter, batch_format="pyarrow")

    lt = _tagged(left, [(left_key, left_key)], lcols, [], order, 0)
    both = add_bucket(lt.union(rt), left_key, nbuckets)
    lnames = [left_key] + [n for n, _ in lcols]

    def part(t: pa.Table) -> pa.Table:
        # pure Arrow: hash-set membership via pc.is_in, no pandas bridge
        t = t.drop_columns([BUCKET_COL])
        lmask = pc.equal(t[_SIDE_COL], 0)
        l_tbl = t.filter(lmask).select(lnames)
        rkeys_col = t.filter(pc.invert(lmask))[left_key].combine_chunks()
        hit = pc.is_in(l_tbl[left_key], value_set=rkeys_col)
        semi_mask = pc.and_(pc.coalesce(hit, pa.scalar(False)),
                            pc.is_valid(l_tbl[left_key]))
        mask = pc.invert(semi_mask) if anti else semi_mask
        return l_tbl.filter(mask)

    return both.groupby(BUCKET_COL).map_groups(part, batch_format="pyarrow")


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key: str, on: str,
              nbuckets: int | None = None,
              direction: str = "backward",
              tolerance=None) -> "ray.data.Dataset":
    """As-of join — each left row is matched to the right row with the
    greatest ``on`` <= its own (``direction="backward"``) or the
    smallest ``on`` >= it (``"forward"``) within the same ``key`` (the
    windowed-lookup operator Ray Data lacks; DuckDB's ``ASOF JOIN`` is
    the oracle).  ``tolerance`` (same units as ``on``; int for
    epoch-integer columns) bounds the match distance — beyond it the
    row is unmatched, like merge_asof.  Composition: side-tagged union
    -> ONE bucket-by-key shuffle -> per-partition ``pandas.merge_asof``
    (vectorized C merge over sorted frames).

    LEFT-join semantics: unmatched rows keep null right columns.
    Partitioning assumption (SURVEY.md: custom operators document their
    key): all rows of one ``key`` value fit one bucket partition.
    Both sides must share ``key``/``on`` names; other column names must
    be disjoint.  The right side's ``on`` is not carried over — copy it
    into a payload column first if the match timestamp is needed.
    """
    import pandas as pd

    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction={direction!r}")
    nbuckets = nbuckets or default_nbuckets()
    lsch, rsch = _pa_schema(left), _pa_schema(right)
    for col in (key, on):
        if lsch.field(col).type != rsch.field(col).type:
            raise ValueError(
                f"as-of column type mismatch on {col!r}: "
                f"{lsch.field(col).type} vs {rsch.field(col).type}")
    shared = (key, on)
    lcols = [(n, lsch.field(n).type) for n in lsch.names if n not in shared]
    rcols = [(n, rsch.field(n).type) for n in rsch.names if n not in shared]
    overlap = {n for n, _ in lcols} & {n for n, _ in rcols}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    on_type = lsch.field(on).type
    if tolerance is not None:
        # fail at the driver, not as an opaque MergeError inside every
        # partition task after the shuffle has already been paid
        import datetime
        is_time = (pa.types.is_timestamp(on_type)
                   or pa.types.is_date(on_type))
        if is_time and not isinstance(tolerance, datetime.timedelta):
            raise ValueError(
                f"tolerance for a {on_type} 'on' column must be a "
                f"datetime.timedelta, got {type(tolerance).__name__}")
        if not is_time and isinstance(tolerance, datetime.timedelta):
            raise ValueError(
                f"tolerance for a {on_type} 'on' column must be numeric, "
                f"got timedelta")
        if (tolerance <= (datetime.timedelta(0) if is_time else 0)):
            raise ValueError("tolerance must be positive")
    fields = ([(key, lsch.field(key).type), (on, on_type)]
              + lcols + rcols)
    order = [n for n, _ in fields] + [_SIDE_COL]

    shared_cols = [(key, key), (on, on)]
    lt = _tagged(left, shared_cols, lcols, rcols, order, 0)
    rt = _tagged(right, shared_cols, rcols, lcols, order, 1)
    both = add_bucket(lt.union(rt), key, nbuckets)

    def part(t: pa.Table) -> pa.Table:
        # Same index-frame idiom as shuffle_join: merge_asof sees only
        # (key, on, position) with Arrow-backed dtypes; payloads are
        # assembled by Arrow `take` (int64-exact, schema-stable).
        # Null `on` or `key` values: right rows can never match (no
        # position on the timeline / no key), left rows pass through
        # unmatched — mirrors the MissingTimestamps null fall-through.
        import numpy as np

        t = t.drop_columns([BUCKET_COL])
        lmask = pc.equal(t[_SIDE_COL], 0)
        l_tbl = t.filter(lmask)
        r_tbl = t.filter(pc.invert(lmask))
        l_ok_mask = pc.and_(pc.is_valid(l_tbl[on]), pc.is_valid(l_tbl[key]))
        l_ok = l_tbl.filter(l_ok_mask)
        l_un = l_tbl.filter(pc.invert(l_ok_mask))
        r_ok = r_tbl.filter(pc.and_(pc.is_valid(r_tbl[on]),
                                    pc.is_valid(r_tbl[key])))

        def unmatched(tbl: pa.Table) -> pa.Table:
            cols = {key: tbl[key], on: tbl[on]}
            for n, _ in lcols:
                cols[n] = tbl[n]
            for n, typ in rcols:
                cols[n] = pa.nulls(tbl.num_rows, typ)
            return pa.table({n: cols[n] for n, _ in fields})

        if l_ok.num_rows == 0 or r_ok.num_rows == 0:
            return pa.concat_tables([unmatched(l_ok), unmatched(l_un)])
        lf = l_ok.select([key, on]).to_pandas(types_mapper=pd.ArrowDtype)
        lf["__il"] = np.arange(len(lf), dtype=np.int64)
        lf = lf.sort_values(on, kind="mergesort")
        rf = r_ok.select([key, on]).to_pandas(types_mapper=pd.ArrowDtype)
        rf["__ir"] = np.arange(len(rf), dtype=np.int64)
        rf = rf.sort_values(on, kind="mergesort")
        m = pd.merge_asof(lf, rf, on=on, by=key, direction=direction,
                          allow_exact_matches=True, tolerance=tolerance)
        li = pa.array(m["__il"].to_numpy(dtype=np.int64), pa.int64())
        ri = pa.Array.from_pandas(m["__ir"], type=pa.int64())
        cols = {key: l_ok[key].take(li), on: l_ok[on].take(li)}
        for n, _ in lcols:
            cols[n] = l_ok[n].take(li)
        for n, _ in rcols:
            cols[n] = r_ok[n].take(ri)
        out = pa.table({n: cols[n] for n, _ in fields})
        if l_un.num_rows:
            out = pa.concat_tables([out, unmatched(l_un)])
        return out

    return both.groupby(BUCKET_COL).map_groups(part, batch_format="pyarrow")
