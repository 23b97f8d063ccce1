"""Window-shaped relational queries (grouped top-k, per-key running sum)
vs DuckDB oracles at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", ["top3_orders_per_customer",
                                  "user_cumulative_value",
                                  "order_price_quantiles"])
def test_window_queries_match_duckdb(name):
    import __ray_entry__ as e
    got = e.queries()[name](SF).to_pandas()
    con = duckdb.connect()
    for t in ["orders", "events"]:
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
