"""Join stage (stages/joins.py): unit semantics + DuckDB oracle parity.

The reference has no relational joins (SURVEY.md §2.6); these cover the
engine's general join surface: broadcast (dimension), bucketed shuffle
(fact x fact), and distinct-key semi/anti.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from mail_deduplicate_ray.stages.joins import (asof_join, broadcast_join,
                                               semi_anti_join, shuffle_join)

SF = "/root/testdata/sf0.001"


def _left():
    return ray.data.from_arrow(pa.table({
        "k": [1, 2, 2, 3, 5], "lval": ["a", "b", "c", "d", "e"]}))


_BUILD = pa.table({"rk": [1, 2, 4], "rval": [10, 20, 40]})


def _rows(ds, order):
    df = ds.to_pandas().sort_values(order).reset_index(drop=True)
    return list(df.itertuples(index=False, name=None))


def test_broadcast_inner():
    out = broadcast_join(_left(), _BUILD, "k", "rk", how="inner")
    assert _rows(out, ["k", "lval"]) == [
        (1, "a", 10), (2, "b", 20), (2, "c", 20)]


def test_broadcast_left():
    out = broadcast_join(_left(), _BUILD, "k", "rk", how="left")
    df = out.to_pandas().sort_values(["k", "lval"])
    assert df["rval"].tolist()[:3] == [10, 20, 20]
    assert df["rval"].isna().tolist() == [False, False, False, True, True]


def test_broadcast_semi_anti():
    semi = broadcast_join(_left(), _BUILD, "k", "rk", how="semi")
    anti = broadcast_join(_left(), _BUILD, "k", "rk", how="anti")
    assert sorted(semi.to_pandas()["k"]) == [1, 2, 2]
    assert sorted(anti.to_pandas()["k"]) == [3, 5]
    # no payload columns appended on semi/anti
    assert semi.schema().names == ["k", "lval"]


def test_broadcast_duplicate_build_keys_rejected():
    dup = pa.table({"rk": [1, 1], "rval": [0, 0]})
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_join(_left(), dup, "k", "rk")


def _right_ds():
    return ray.data.from_arrow(pa.table({
        "rk": [1, 2, 2, 4], "rval": [10, 20, 21, 40]}))


def test_shuffle_join_inner_matches_pandas():
    out = shuffle_join(_left(), _right_ds(), "k", "rk", how="inner",
                       nbuckets=3)
    got = _rows(out, ["k", "lval", "rval"])
    exp = (_left().to_pandas()
           .merge(_right_ds().to_pandas().rename(columns={"rk": "k"}),
                  on="k", how="inner"))
    assert got == sorted(exp.itertuples(index=False, name=None))


def test_shuffle_join_left_nulls():
    out = shuffle_join(_left(), _right_ds(), "k", "rk", how="left",
                       nbuckets=3).to_pandas()
    assert len(out) == 7  # 1x1 + 2x(2 dup rvals) + 3 + 5 unmatched
    assert out.loc[out.k.isin([3, 5]), "rval"].isna().all()


def test_shuffle_join_collision_rejected():
    bad = ray.data.from_arrow(pa.table({"rk": [1], "lval": ["x"]}))
    with pytest.raises(ValueError, match="collision"):
        shuffle_join(_left(), bad, "k", "rk")


def test_semi_anti_join_distributed():
    right = ray.data.from_arrow(pa.table({"rk": [2, 2, 5, 9]}))
    semi = semi_anti_join(_left(), right, "k", "rk", nbuckets=3)
    anti = semi_anti_join(_left(), right, "k", "rk", anti=True, nbuckets=3)
    assert sorted(semi.to_pandas()["k"]) == [2, 2, 5]
    assert sorted(anti.to_pandas()["k"]) == [1, 3]
    assert list(anti.to_pandas().columns) == ["k", "lval"]


# --- oracle parity on the real sf0.001 tables -----------------------------

_ORACLE_QUERIES = ["revenue_by_nation", "part_brand_revenue",
                   "customers_without_orders", "priority_orders_semi"]


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_join_queries_match_duckdb(name):
    import __ray_entry__ as e
    got = e.queries()[name](SF).to_pandas()
    con = duckdb.connect()
    for t in ["orders", "customer", "nation", "lineitem", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(e.oracle_sql()[name]).fetchdf()
    assert list(got.columns) == list(exp.columns)
    key = list(got.columns)
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    for c in got.columns:
        pd.testing.assert_series_equal(
            got[c], exp[c].astype(got[c].dtype), check_names=False)


# --- as-of join -----------------------------------------------------------

def test_asof_join_backward_semantics():
    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2, 3], "t": [10, 25, 7, 5], "lv": ["p1", "p2", "p3", "p4"]}))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2], "t": [8, 20, 9], "rv": [100, 200, 300]}))
    out = (asof_join(left, right, key="k", on="t", nbuckets=2)
           .to_pandas().sort_values("lv").reset_index(drop=True))
    # p1@10 -> rv@8; p2@25 -> rv@20; p3@7 -> no right t<=7 for k=2 -> null;
    # p4 (k=3, no right rows) -> null
    assert out["rv"].tolist()[:2] == [100, 200]
    assert out["rv"].isna().tolist() == [False, False, True, True]


def test_asof_join_exact_match_allowed():
    left = ray.data.from_arrow(pa.table({"k": [1], "t": [20], "lv": ["x"]}))
    right = ray.data.from_arrow(pa.table({"k": [1], "t": [20], "rv": [7]}))
    out = asof_join(left, right, key="k", on="t").to_pandas()
    assert out["rv"].tolist() == [7]


def test_purchase_after_signup_matches_duckdb_asof():
    import __ray_entry__ as e
    got = e.queries()["purchase_after_signup"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    exp = con.execute(e.oracle_sql()["purchase_after_signup"]).fetchdf()
    assert list(got.columns) == list(exp.columns)
    got = got.sort_values("event_id").reset_index(drop=True)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].astype(got[c].dtype).values).all(), c


# --- simhash near-dup pairs: exact banding vs brute force -----------------

def test_simhash_pairs_match_bruteforce():
    import numpy as np
    import pyarrow.parquet as pq

    from mail_deduplicate_ray.functions import shingles, simhash
    from mail_deduplicate_ray.pipelines.docs import simhash_neardup_pairs

    got = simhash_neardup_pairs(SF, max_hamming=3).to_pandas()
    got_pairs = set(zip(got["a_id"], got["b_id"]))

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy()
    fp = np.asarray(
        [simhash.token_simhash(shingles.token_hashes((v or "").lower()))
         for v in t["text"].to_pylist()], dtype=np.uint64)
    iu, ju = np.triu_indices(len(fp), 1)
    ok = simhash.hamming(fp[iu], fp[ju]) <= 3
    a = np.minimum(ids[iu[ok]], ids[ju[ok]])
    b = np.maximum(ids[iu[ok]], ids[ju[ok]])
    exp_pairs = set(zip(a, b))
    assert len(exp_pairs) > 0
    assert got_pairs == exp_pairs


# --- salted (skew) shuffle join -------------------------------------------

def test_salted_shuffle_join_matches_unsalted():
    import numpy as np
    rng = np.random.default_rng(7)
    # one mega-hot key (0) + a tail
    lk = np.concatenate([np.zeros(500, np.int64),
                         rng.integers(1, 50, 200)])
    left = ray.data.from_arrow(pa.table({
        "k": lk, "lval": np.arange(len(lk), dtype=np.int64)}))
    right = ray.data.from_arrow(pa.table({
        "rk": np.arange(0, 50, dtype=np.int64),
        "rval": np.arange(100, 150, dtype=np.int64)}))

    def rows(ds):
        df = ds.to_pandas().sort_values(["k", "lval"]).reset_index(drop=True)
        return list(df.itertuples(index=False, name=None))

    plain = rows(shuffle_join(left, right, "k", "rk", nbuckets=4))
    salted = rows(shuffle_join(left, right, "k", "rk", nbuckets=4, salt=8))
    assert salted == plain and len(plain) == 700

    salted_left = rows(shuffle_join(left, right, "k", "rk", how="left",
                                    nbuckets=4, salt=8))
    assert salted_left == rows(shuffle_join(left, right, "k", "rk",
                                            how="left", nbuckets=4))


def test_asof_join_null_on_values():
    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 1], "t": pa.array([10, None, 25], pa.int64()),
        "lv": ["a", "b", "c"]}))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 1], "t": pa.array([8, None], pa.int64()),
        "rv": [100, 999]}))
    out = (asof_join(left, right, key="k", on="t")
           .to_pandas().sort_values("lv").reset_index(drop=True))
    # null-t left row passes through unmatched; null-t right row never matches
    assert out["rv"].tolist()[0] == 100 and out["rv"].tolist()[2] == 100
    assert out["rv"].isna().tolist() == [False, True, False]


# --- review-fix regressions -----------------------------------------------

def test_shuffle_join_preserves_large_int64():
    big = 2**53 + 1  # not representable in float64
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "lval": pa.array([big, big + 2], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1], pa.int64()),
        "rval": pa.array([big + 1], pa.int64())}))
    out = shuffle_join(left, right, "k", "rk", how="left", nbuckets=2)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert t.schema.field("lval").type == pa.int64()
    assert t.schema.field("rval").type == pa.int64()
    df = t.to_pandas().sort_values("k")
    assert df["lval"].tolist() == [big, big + 2]  # exact, no float rounding
    assert df["rval"].tolist()[0] == big + 1

    anti = semi_anti_join(left, right, "k", "rk", anti=True, nbuckets=2)
    ta = pa.concat_tables(anti.iter_batches(batch_format="pyarrow"))
    assert ta.schema.field("lval").type == pa.int64()
    assert ta["lval"].to_pylist() == [big + 2]


def test_shuffle_join_right_payload_named_left_key_rejected():
    bad = ray.data.from_arrow(pa.table({"rk": [1], "k": [9]}))
    with pytest.raises(ValueError, match="collision"):
        shuffle_join(_left(), bad, "k", "rk")


def test_shuffle_join_key_type_mismatch_rejected():
    bad = ray.data.from_arrow(pa.table({
        "rk": pa.array([1], pa.int32()), "rval": [9]}))
    with pytest.raises(ValueError, match="type mismatch"):
        shuffle_join(_left(), bad, "k", "rk")


def test_null_keys_never_match():
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 2], pa.int64()), "lval": ["a", "b", "c"]}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1, None], pa.int64()), "rval": [10, 99]}))
    inner = shuffle_join(left, right, "k", "rk", nbuckets=2).to_pandas()
    assert sorted(inner["lval"]) == ["a"]  # null != null
    lj = shuffle_join(left, right, "k", "rk", how="left",
                      nbuckets=2).to_pandas().sort_values("lval")
    assert lj["rval"].isna().tolist() == [False, True, True]
    # EXISTS / NOT EXISTS: null left key -> no match -> anti keeps it
    semi = semi_anti_join(left, right, "k", "rk", nbuckets=2).to_pandas()
    anti = semi_anti_join(left, right, "k", "rk", anti=True,
                          nbuckets=2).to_pandas()
    assert sorted(semi["lval"]) == ["a"]
    assert sorted(anti["lval"]) == ["b", "c"]
    # broadcast path agrees
    bsemi = broadcast_join(left, pa.table(
        {"rk": pa.array([1], pa.int64()), "rval": [10]}), "k", "rk",
        how="semi").to_pandas()
    assert sorted(bsemi["lval"]) == ["a"]


def test_stratified_sample_null_lang_takes_else_rate():
    import numpy as np
    from mail_deduplicate_ray.pipelines import docs as docs_mod
    # null-lang docs must sample at the ELSE (30%) rate, as SQL CASE does
    ids = np.arange(1000, dtype=np.int64)
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(1 << 32) % np.uint64(100)
    expected = int((h < 30).sum())
    import pyarrow.parquet as pq, tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": ids,
            "lang": pa.nulls(len(ids), pa.string()),
            "text": ["x"] * len(ids)}), os.path.join(d, "documents.parquet"))
        got = docs_mod.stratified_sample_docs(d).to_pandas()
    assert len(got) == expected > 0


def test_shuffle_join_composite_keys():
    left = ray.data.from_arrow(pa.table({
        "a": [1, 1, 2, None], "b": ["x", "y", "x", "x"],
        "lv": [10, 11, 12, 13]}))
    right = ray.data.from_arrow(pa.table({
        "a": [1, 1, 2], "b": ["x", "z", "x"], "rv": [100, 101, 102]}))
    inner = shuffle_join(left, right, ["a", "b"], ["a", "b"],
                         nbuckets=2).to_pandas()
    assert sorted(zip(inner["lv"], inner["rv"])) == [(10, 100), (12, 102)]
    lj = shuffle_join(left, right, ["a", "b"], ["a", "b"], how="left",
                      nbuckets=2).to_pandas().sort_values("lv")
    assert lj["rv"].isna().tolist() == [False, True, False, True]


def test_shuffle_join_full_outer():
    out = shuffle_join(_left(), _right_ds(), "k", "rk", how="full",
                       nbuckets=3).to_pandas()
    # matched: k=1 (1 row), k=2 (2 lvals x 2 rvals = 4); left-only: 3, 5;
    # right-only: 4
    assert len(out) == 8
    assert out.loc[out.k.isin([3, 5]), "rval"].isna().all()
    r_only = out[out.k == 4]
    assert len(r_only) == 1 and r_only["lval"].isna().all()
    assert r_only["rval"].tolist() == [40]


def test_shuffle_join_full_outer_null_keys_pass_through():
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64()), "lval": ["a", "b"]}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([None, 2], pa.int64()), "rval": [10, 20]}))
    out = shuffle_join(left, right, "k", "rk", how="full",
                       nbuckets=2).to_pandas()
    # NULL keys match nothing but pass through unmatched on BOTH sides
    assert len(out) == 4
    assert out["lval"].notna().sum() == 2
    assert out["rval"].notna().sum() == 2
    assert (out["lval"].notna() & out["rval"].notna()).sum() == 0


def test_shuffle_join_full_outer_matches_duckdb():
    con = duckdb.connect()
    ldf = _left().to_pandas()
    rdf = _right_ds().to_pandas()
    con.register("l", ldf)
    con.register("r", rdf)
    exp = con.execute("""
        SELECT COALESCE(l.k, r.rk) AS k, lval, rval
        FROM l FULL OUTER JOIN r ON l.k = r.rk
        ORDER BY k, lval, rval
    """).df()
    got = (shuffle_join(_left(), _right_ds(), "k", "rk", how="full",
                        nbuckets=3).to_pandas()
           .sort_values(["k", "lval", "rval"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "lval", "rval"]],
                                  exp, check_dtype=False)


def test_shuffle_join_full_salted_rejected():
    with pytest.raises(ValueError, match="salted"):
        shuffle_join(_left(), _right_ds(), "k", "rk", how="full", salt=2)


class TestBloomPrefilter:
    def test_bloom_no_false_negatives(self):
        import numpy as np

        from mail_deduplicate_ray.functions import bloom

        rng = np.random.default_rng(3)
        present = rng.integers(0, 1 << 40, 5000)
        w = bloom.add(bloom.empty(1 << 16), present)
        assert bloom.contains(w, present).all()
        # absent keys: mostly filtered, some false positives allowed
        absent = rng.integers(1 << 41, 1 << 42, 5000)
        fp = bloom.contains(w, absent).mean()
        assert fp < 0.05

    def test_bloom_semi_equals_exact_semi(self):
        right = ray.data.from_arrow(pa.table({"rk": [2, 2, 5, 9]}))
        exact = sorted(semi_anti_join(_left(), right, "k", "rk",
                                      nbuckets=3).to_pandas()["k"])
        with_bloom = sorted(semi_anti_join(
            _left(), right, "k", "rk", nbuckets=3,
            bloom_bits=1 << 10).to_pandas()["k"])
        assert with_bloom == exact == [2, 2, 5]
        # tiny (collision-heavy) filter still yields the exact result
        tiny = sorted(semi_anti_join(_left(), right, "k", "rk", nbuckets=3,
                                     bloom_bits=64).to_pandas()["k"])
        assert tiny == exact

    def test_bloom_string_keys(self):
        left = ray.data.from_arrow(pa.table({
            "k": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]}))
        right = ray.data.from_arrow(pa.table({"rk": ["b", "d", "zz"]}))
        out = semi_anti_join(left, right, "k", "rk",
                             bloom_bits=1 << 12).to_pandas()
        assert sorted(out["k"]) == ["b", "d"]

    def test_bloom_anti_rejected(self):
        right = ray.data.from_arrow(pa.table({"rk": [1]}))
        with pytest.raises(ValueError, match="semi-only"):
            semi_anti_join(_left(), right, "k", "rk", anti=True,
                           bloom_bits=1 << 10)


def test_bloom_semi_with_null_left_keys_matches_exact():
    # regression: a null key in a probe batch must not poison the
    # batch's hashing (int64 -> float64 conversion made every key miss)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 5, None], pa.int64()),
        "lval": ["a", "b", "c", "d", "e", "f"]}))
    right = ray.data.from_arrow(pa.table({"rk": [2, 2, 5, 9]}))
    exact = sorted(semi_anti_join(left, right, "k", "rk",
                                  nbuckets=3).to_pandas()["k"])
    got = sorted(semi_anti_join(left, right, "k", "rk", nbuckets=3,
                                bloom_bits=1 << 12).to_pandas()["k"])
    assert got == exact == [2, 2, 5]


def test_asof_forward_with_tolerance():
    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 1], "ts": pa.array([10, 50, 90], pa.int64()),
        "lid": ["a", "b", "c"]}))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 1], "ts": pa.array([12, 100], pa.int64()),
        "rid": ["x", "y"]}))
    out = (asof_join(left, right, key="k", on="ts", nbuckets=2,
                     direction="forward", tolerance=15)
           .to_pandas().sort_values("lid"))
    # a(10)->x(12, diff 2); b(50)->nearest forward is y(100) but diff 50
    # exceeds tolerance 15 -> unmatched; c(90)->y(100, diff 10)
    assert out["rid"].tolist() == ["x", None, "y"]


def test_asof_bad_direction_rejected():
    ds = ray.data.from_arrow(pa.table({"k": [1], "ts": [1]}))
    with pytest.raises(ValueError, match="direction"):
        asof_join(ds, ds, key="k", on="ts", direction="sideways")


def test_asof_tolerance_validated_eagerly():
    import datetime
    left = ray.data.from_arrow(pa.table({
        "k": [1], "ts": pa.array([10], pa.int64())}))
    with pytest.raises(ValueError, match="numeric"):
        asof_join(left, left, key="k", on="ts",
                  tolerance=datetime.timedelta(seconds=1))
    with pytest.raises(ValueError, match="positive"):
        asof_join(left, left, key="k", on="ts", tolerance=0)
    ts_left = ray.data.from_arrow(pa.table({
        "k": [1], "ts": pa.array([10], pa.timestamp("us"))}))
    with pytest.raises(ValueError, match="timedelta"):
        asof_join(ts_left, ts_left, key="k", on="ts", tolerance=5)
