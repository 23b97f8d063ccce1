"""Window-shaped relational queries (grouped top-k, per-key running sum)
vs DuckDB oracles at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", ["top3_orders_per_customer",
                                  "user_cumulative_value",
                                  "order_price_quantiles",
                                  "sample_k_per_lang",
                                  "top_trigrams",
                                  "user_event_pivot",
                                  "distinct_users_per_day",
                                  "cap_events_per_user_type"])
def test_window_queries_match_duckdb(name):
    import __ray_entry__ as e
    got = e.queries()[name](SF).to_pandas()
    con = duckdb.connect()
    for t in ["orders", "events", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(e.oracle_sql()[name]).fetchdf()
    assert list(got.columns) == list(exp.columns)
    key = list(got.columns)
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].astype(got[c].dtype).values).all(), c


def test_stratified_sample_deterministic_and_matches_oracle():
    import __ray_entry__ as e
    got = e.queries()["stratified_sample_docs"](SF).to_pandas()
    again = e.queries()["stratified_sample_docs"](SF).to_pandas()
    assert got.equals(again)  # no RNG state, reproducible at any layout
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(e.oracle_sql()["stratified_sample_docs"]).fetchdf()
    assert len(got) == len(exp) > 0
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    # both strata actually sampled
    assert set(got["lang"]) >= {"en"} and len(set(got["lang"])) > 1


def test_decontaminate_docs_matches_oracle():
    import __ray_entry__ as e
    got = e.queries()["decontaminate_docs"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = con.execute(e.oracle_sql()["decontaminate_docs"]).fetchdf()
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].values == exp[c].astype(got[c].dtype).values).all(), c
    # eval docs never flag themselves
    assert not (got["doc_id"] % 97 == 0).any()


def test_hll_approx_distinct_within_error_bound():
    import duckdb as dk

    from mail_deduplicate_ray.pipelines.relational import \
        approx_distinct_users
    est = approx_distinct_users(SF)["n_users_approx"][0].as_py()
    exact = dk.connect().execute(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF}/events.parquet')").fetchone()[0]
    # p=12 -> sigma ~1.6%; small cardinalities hit the linear-counting
    # branch and are near-exact
    assert abs(est - exact) / max(exact, 1) < 0.05


def test_hll_registers_independent_of_batching():
    import numpy as np

    from mail_deduplicate_ray.functions import sketch
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**60, 20000, dtype=np.uint64)
    whole = sketch.hll_partial(vals)
    merged = np.zeros(4096, np.uint8)
    for chunk in np.array_split(vals, 13):
        merged = sketch.hll_merge(merged, sketch.hll_partial(chunk))
    assert (whole == merged).all()


def test_range_join_views_before_purchase_boundaries(tmp_path):
    """Planted boundary cases for the 1h range join: a view exactly at
    t-1h (inclusive), one just outside, one at t, and cross-cell
    placement — compared against DuckDB on the same fragment."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mail_deduplicate_ray.pipelines.relational import (
        views_before_purchase_1h)

    H = 3600 * 1_000_000
    base = 1_700_000_000 * 1_000_000
    # purchase at base+H+1s (cell 1 of its hour grid)
    p_ts = base + H + 1_000_000
    rows = [
        (1, p_ts, 7, "purchase"),
        (2, p_ts - H, 7, "view"),          # exactly t-1h -> included
        (3, p_ts - H - 1, 7, "view"),      # 1us outside -> excluded
        (4, p_ts, 7, "view"),              # exactly t -> included
        (5, p_ts - H // 2, 7, "view"),     # previous cell -> included
        (6, p_ts - H // 2, 8, "view"),     # other user -> excluded
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = views_before_purchase_1h(str(tmp_path)).to_pandas()
    assert got.to_dict("records") == [{"event_id": 1, "n_views_1h": 3}]

    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute("""
        SELECT p.event_id AS event_id, count(*) AS n_views_1h
        FROM events p JOIN events v
          ON p.user_id = v.user_id
         AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        GROUP BY p.event_id ORDER BY event_id
    """).df()
    assert got.to_dict("records") == exp.to_dict("records")


def test_ntile_fewer_rows_than_tiles(tmp_path):
    """n < k: ntile assigns one row per tile 1..n — formula edge where
    the small-bucket size floors to zero."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mail_deduplicate_ray.pipelines.relational import (
        order_quartiles_ntile)

    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 10, 11, 12, 13, 14], pa.int64()),
        "o_orderstatus": pa.array(["A"] * 3 + ["B"] * 5, pa.string()),
        # duplicate price inside A exercises the tie path
        "o_totalprice": pa.array([5.0, 5.0, 9.0,
                                  1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
    })
    pq.write_table(t, tmp_path / "orders.parquet")

    got = order_quartiles_ntile(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("orders", t)
    exp = con.execute("""
        SELECT o_orderkey, o_orderstatus,
               ntile(4) OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                            o_orderkey) AS quartile
        FROM orders ORDER BY o_orderkey
    """).df()
    assert got.to_dict("records") == exp.to_dict("records")


def test_hopping_window_requires_divisible_hop():
    import pytest as _pytest

    from mail_deduplicate_ray.pipelines.relational import (
        events_hopping_window)
    with _pytest.raises(ValueError, match="divide"):
        events_hopping_window("/root/testdata/sf0.001", size_min=5,
                              hop_min=2)


def test_ntile_parallelism_independent():
    """order_quartiles_ntile must give identical labels at any bucket
    count: base ranks come from the global value-count histogram and
    ties resolve inside one bucket, so partitioning cannot shift
    tiles."""
    from unittest import mock

    from mail_deduplicate_ray.pipelines import relational
    from mail_deduplicate_ray.stages import bucketing

    sf = "/root/testdata/sf0.001"
    base = relational.order_quartiles_ntile(sf).to_pandas()
    with mock.patch.object(bucketing, "default_nbuckets", lambda: 3):
        alt = relational.order_quartiles_ntile(sf).to_pandas()
    assert base.equals(alt)


class TestCountMin:
    def test_never_undercounts_and_merge_order_free(self):
        import numpy as np
        from mail_deduplicate_ray.functions import sketch
        rng = np.random.default_rng(3)
        # zipf-ish stream split into 4 partials
        keys = rng.zipf(1.5, size=20000).astype(np.uint64)
        uniq, true_cnt = np.unique(keys, return_counts=True)
        parts = np.array_split(keys, 4)
        cms = []
        for p in parts:
            u, c = np.unique(p, return_counts=True)
            cms.append(sketch.cm_partial(u, c))
        m1 = sketch.cm_merge(sketch.cm_merge(cms[0], cms[1]),
                             sketch.cm_merge(cms[2], cms[3]))
        m2 = cms[3]
        for x in cms[:3]:
            m2 = sketch.cm_merge(m2, x)
        assert (m1 == m2).all()
        est = sketch.cm_query(m1, uniq)
        assert (est >= true_cnt).all()          # CM upper bound
        # heavy hitters have zero false negatives at any threshold
        for thr in (10, 100, 1000):
            cand = set(uniq[est >= thr].tolist())
            assert set(uniq[true_cnt >= thr].tolist()) <= cand
        # and the estimates are tight for a 20k stream in a 4x4096 grid
        assert int((est - true_cnt).max()) <= 40

    def test_heavy_tokens_matches_counter(self):
        import collections

        import pyarrow.parquet as pq
        from mail_deduplicate_ray.pipelines import docs as docs_mod
        d = "/root/testdata/sf0.001"
        got = {r["tok"]: r["n"]
               for r in docs_mod.heavy_tokens(d, min_count=500).take_all()}
        cnt = collections.Counter()
        t = pq.read_table(f"{d}/documents.parquet", columns=["text"])
        for v in t["text"].to_pylist():
            cnt.update((v or "").split())
        want = {k: n for k, n in cnt.items() if n >= 500}
        assert got == want and len(want) > 0


class TestNBClassifier:
    def _corpus(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        rows, did = [], 0
        marker = {"en": "hello world the", "de": "hallo welt der",
                  "fr": "bonjour monde le"}
        for lang, mk in marker.items():
            for i in range(8):
                rows.append((did, f"{mk} noise{i % 3} shared token", lang))
                did += 1
        rows.append((did, None, "en"))          # null text -> prior argmax
        rows.append((did + 1, "   ", "de"))     # whitespace-only ditto
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path), {r[0]: r[2] for r in rows}

    def test_planted_signal_training_accuracy(self, tmp_path):
        """Lang-distinctive marker tokens -> NB must recover every label
        on the training set (the signal case the synthetic sf tables
        cannot exercise: their lang column is independent of text)."""
        from mail_deduplicate_ray.pipelines import docs as docs_mod
        d, truth = self._corpus(tmp_path)
        got = {r["doc_id"]: r["pred_lang"]
               for r in docs_mod.nb_lang_classifier_docs(d).take_all()}
        assert len(got) == len(truth)
        # empty-text docs fall back to the prior argmax: en and de tie
        # at 9 docs each (8 + one empty-text row), so the deterministic
        # min-lang tie-break picks 'de' — the tie-break contract itself
        for did, lang in truth.items():
            want = "de" if did >= len(truth) - 2 else lang
            assert got[did] == want, (did, got[did], want)

    def test_deterministic_across_runs(self, tmp_path):
        from mail_deduplicate_ray.pipelines import docs as docs_mod
        d, _ = self._corpus(tmp_path)
        a = docs_mod.nb_lang_classifier_docs(d).take_all()
        b = docs_mod.nb_lang_classifier_docs(d).take_all()
        assert a == b
