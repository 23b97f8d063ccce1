"""The oracle sweep (tools/check_oracles.py) must see exactly what the
driver's typed value-hash sees — in particular dtype drift between the
engine frame and the oracle's ``.df()`` materialization, the class that
shipped 4 red driver rows in round 1 (``sum()``→BIGINT) and 1 in round 4
(HUGEINT→float64)."""

from __future__ import annotations

import sys

import pandas as pd

sys.path.insert(0, "/root/repo/tools")

from check_oracles import canon, compare  # noqa: E402


def _frames():
    mine = pd.DataFrame({"doc_id": [1, 2], "score": pd.array(
        [10, 20], dtype="int64")})
    oracle = mine.copy()
    return mine, oracle


class TestOracleCompare:
    def test_equal_frames_pass(self):
        mine, oracle = _frames()
        assert compare(canon(mine), canon(oracle)) == "ok  "

    def test_uncast_hugeint_oracle_fails_on_dtype(self):
        # DuckDB sum(BIGINT) widens to HUGEINT; pandas materializes that
        # as float64.  Values are equal — the sweep must STILL fail,
        # because the driver's typed hash does.
        mine, oracle = _frames()
        oracle["score"] = oracle["score"].astype("float64")
        status = compare(canon(mine), canon(oracle))
        assert status.startswith("FAIL(dtype")
        assert "score" in status

    def test_value_mismatch_still_caught(self):
        mine, oracle = _frames()
        oracle.loc[1, "score"] = 99
        assert compare(canon(mine), canon(oracle)).startswith("FAIL(values")

    def test_row_and_col_mismatch(self):
        mine, oracle = _frames()
        assert compare(canon(mine), canon(oracle.head(1))) == "FAIL(rows)"
        ren = oracle.rename(columns={"score": "sum_score"})
        assert compare(canon(mine), canon(ren)).startswith("FAIL(cols")

    def test_canon_folds_uint64_not_float(self):
        # canon() normalizes uint64→int64 (hash columns round-trip
        # through parquet as either) but must NOT paper over float64
        mine, oracle = _frames()
        oracle["score"] = oracle["score"].astype("uint64")
        assert compare(canon(mine), canon(oracle)) == "ok  "
