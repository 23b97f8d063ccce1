"""Distributed set operations (stages/setops.py) — DISTINCT semantics,
null-key drop, composite keys, empty sides."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data

from mail_deduplicate_ray.stages.setops import set_op


def _ds(vals, name="k"):
    return ray.data.from_arrow(pa.table({name: pa.array(vals, pa.int64())}))


def _col(ds, name="k"):
    return sorted(r[name] for r in ds.take_all())


def test_intersect_distinct():
    left = _ds([1, 1, 2, 3, 4])
    right = _ds([2, 2, 4, 5])
    assert _col(set_op(left, right, "k", "intersect")) == [2, 4]


def test_except_distinct():
    left = _ds([1, 1, 2, 3, 4])
    right = _ds([2, 4, 5])
    assert _col(set_op(left, right, "k", "except")) == [1, 3]


def test_union_distinct():
    left = _ds([1, 1, 2])
    right = _ds([2, 3])
    assert _col(set_op(left, right, "k", "union")) == [1, 2, 3]


def test_null_keys_dropped_both_sides():
    left = _ds([1, None, 2])
    right = _ds([None, 2])
    assert _col(set_op(left, right, "k", "intersect")) == [2]
    assert _col(set_op(left, right, "k", "except")) == [1]


def test_empty_right_side():
    left = _ds([1, 2])
    right = _ds([])
    assert _col(set_op(left, right, "k", "except")) == [1, 2]
    assert _col(set_op(left, right, "k", "intersect")) == []


def test_composite_key_intersect():
    left = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 1, 2, 2], pa.int64()),
        "b": pa.array(["x", "y", "x", "y"], pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2], pa.int64()),
        "b": pa.array(["y", "z"], pa.string())}))
    out = set_op(left, right, ["a", "b"], "intersect").take_all()
    assert [(r["a"], r["b"]) for r in out] == [(1, "y")]


def test_unknown_op_rejected():
    with pytest.raises(ValueError):
        set_op(_ds([1]), _ds([1]), "k", "minus")


@pytest.mark.parametrize("nbuckets", [1, 3, 16])
def test_set_op_parallelism_independent(nbuckets):
    """Same result at any bucket count (cluster-size independence —
    the determinism contract every wide stage carries)."""
    left = _ds([1, 1, 2, 3, 4, 7, 9])
    right = _ds([2, 4, 5, 9])
    assert _col(set_op(left, right, "k", "intersect",
                       nbuckets=nbuckets)) == [2, 4, 9]
    assert _col(set_op(left, right, "k", "except",
                       nbuckets=nbuckets)) == [1, 3, 7]
