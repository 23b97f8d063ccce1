"""Resumable content-partitioned parquet writer (SURVEY.md scale rule:
"write partitioned output so a failed run can skip finished partitions";
≙ the reference's idempotent export boxes, mail_box.py:490-511, lifted
to shard granularity).

``write_sharded`` routes every row to ``shard = hash(key) % nshards``
(pandas.util.hash_array — deterministic across processes, parallelism
and runs), writes each shard as its own ``shard=NNNN/`` directory and
marks it with an empty ``_SUCCESS`` file LAST.  A re-run over the same
input:

- lists finished shards from the markers (one cheap glob),
- DROPS their rows inside the very first map_batches (the scan still
  streams them, but nothing shuffles and nothing rewrites),
- rebuilds only the missing/unfinished shards, bit-identical to what a
  full run would have produced (content-hash routing is independent of
  block structure).

Crash safety: data files land under deterministic names via tmp +
rename, so a retried Ray task overwrites its own partial output; the
marker is only written after every file of the shard is in place.
Readers: plain ``pyarrow.parquet`` / ``ray.data.read_parquet`` over the
root — underscore-prefixed files are ignored by parquet dataset
convention.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_SHARD_COL = "__shard"


def _shard_of(vals: "pd.Series | np.ndarray", nshards: int) -> np.ndarray:
    return (pd.util.hash_array(np.asarray(vals))
            % np.uint64(nshards)).astype(np.int32)


def finished_shards(out_dir: "str | Path") -> set[int]:
    return {int(p.parent.name.split("=")[1])
            for p in Path(out_dir).glob("shard=*/_SUCCESS")}


def write_sharded(ds: "object", out_dir: "str | Path", key: str,
                  nshards: int = 64) -> dict:
    """Write ``ds`` under ``out_dir/shard=NNNN/`` partitioned by
    ``hash(key) % nshards``; skip shards already marked ``_SUCCESS``.
    Returns ``{"written": [...], "skipped": [...], "rows_written": n}``.
    """
    from mail_deduplicate_ray.stages.bucketing import grouped

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = finished_shards(out)

    def route(t: pa.Table) -> pa.Table:
        sid = _shard_of(t[key].to_numpy(zero_copy_only=False), nshards)
        t = t.append_column(_SHARD_COL, pa.array(sid, pa.int32()))
        if done:
            keep = ~np.isin(sid, list(done))
            t = t.filter(pa.array(keep))
        return t

    routed = ds.map_batches(route, batch_format="pyarrow")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for sid, g in df.groupby(_SHARD_COL, sort=True):
            sdir = out / f"shard={int(sid):04d}"
            sdir.mkdir(parents=True, exist_ok=True)
            body = g.drop(columns=[_SHARD_COL]) \
                .sort_values(key, kind="stable")
            tbl = pa.Table.from_pandas(body, preserve_index=False)
            tmp = sdir / f".part-0000.tmp-{os.getpid()}"
            pq.write_table(tbl, tmp, row_group_size=65536)
            tmp.rename(sdir / "part-0000.parquet")  # idempotent on retry
            (sdir / "_SUCCESS").touch()             # marker LAST
            rows.append((int(sid), len(body)))
        return pd.DataFrame(rows or [(-1, 0)],
                            columns=["shard", "rows"])

    stats = grouped(routed, _SHARD_COL, part, nbuckets=nshards).take_all()
    written = sorted(r["shard"] for r in stats if r["shard"] >= 0)
    return {"written": written, "skipped": sorted(done),
            "rows_written": int(sum(r["rows"] for r in stats
                                    if r["shard"] >= 0))}
