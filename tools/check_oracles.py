"""Driver-style side-by-side check: run each queries() entry and its
oracle_sql() on the same sf dir, compare row count + schema + sorted values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("uint64"):
            df[c] = df[c].astype("int64", errors="ignore")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    """Driver-style verdict for one query: rows, columns, values AND
    canonical dtypes must agree.  The dtype leg exists because the
    driver's value-hash is typed — an oracle that materializes e.g.
    DuckDB HUGEINT as float64 while the engine emits int64 hash-fails
    with numerically equal values (this class shipped 4 red rows in
    round 1 and 1 in round 4)."""
    if len(mine) != len(oracle):
        return "FAIL(rows)"
    if list(mine.columns) != list(oracle.columns):
        return f"FAIL(cols {list(mine.columns)} vs {list(oracle.columns)})"
    try:
        pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
    except AssertionError as e:
        return f"FAIL(values: {str(e).splitlines()[-1][:120]})"
    md = [str(t) for t in mine.dtypes]
    od = [str(t) for t in oracle.dtypes]
    if md != od:
        bad = [(c, a, b) for c, a, b in zip(mine.columns, md, od) if a != b]
        return f"FAIL(dtype {bad})"
    return "ok  "


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only) [{dt:.1f}s]")
            continue
        oracle = canon(con.execute(oracles[name]).df())
        status = compare(mine, oracle)
        if status.startswith("FAIL"):
            failures += 1
        print(f"{status} {name}: rows={len(mine)} vs {len(oracle)} [{dt:.1f}s]")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray
    ray.shutdown()
    sys.exit(rc)
