"""Resumable content-partitioned parquet writer (SURVEY.md scale rule:
"write partitioned output so a failed run can skip finished partitions";
≙ the reference's idempotent export boxes, mail_box.py:490-511, lifted
to shard granularity).

``write_sharded`` routes every row to ``shard = hash(key) % nshards``
(pandas.util.hash_array — deterministic across processes, parallelism
and runs) and STREAMS the write: each incoming Arrow block appends its
per-shard slices as their own ``part-*.parquet`` files under
``shard=NNNN/`` (bounded memory — a task never holds more than one
block, so a shard may be arbitrarily larger than worker heap), then the
driver seals every shard with a ``_MANIFEST.json`` (file list + row
count) and an empty ``_SUCCESS`` marker LAST — including shards that
received zero rows, so a finished export is FULLY marked and a re-run
short-circuits without re-streaming anything.

A re-run over the same input:

- lists finished shards from the markers (one cheap glob),
- deletes any unfinished shard directories (orphan parts from the
  crashed attempt — they are not covered by a manifest and must not be
  double-counted),
- DROPS finished shards' rows inside the very first map_batches (the
  scan still streams them, but nothing shuffles and nothing rewrites),
- rebuilds only the missing/unfinished shards with the same row
  content a full run would have produced (content-hash routing is
  independent of block structure; the per-shard file LAYOUT is
  block-structure-dependent, the row multiset is not).

Crash safety: part files land via tmp + rename under a name derived
from the owning Ray task id + a per-task sequence number, so a retried
task deterministically overwrites its own partial output instead of
duplicating rows; markers/manifests are only written after the whole
stream has been consumed.  Readers: plain ``pyarrow.parquet`` /
``ray.data.read_parquet`` over the root — underscore-prefixed files are
ignored by parquet dataset convention.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
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


def _task_tag() -> str:
    """Stable-across-retries identity for the running Ray task (retried
    tasks keep their TaskID, so a retry overwrites its own files)."""
    try:
        import ray
        tid = ray.get_runtime_context().get_task_id()
        if tid:
            return tid[:16]
    except Exception:  # noqa: BLE001 — non-Ray caller (unit tests)
        pass
    return uuid.uuid4().hex[:16]


class _BlockWriter:
    """Per-task part writer: splits each block by shard, appends one
    parquet part per (block, shard) slice, returns tiny accounting rows.
    A callable class so the per-task part sequence counter survives
    across the batches one task processes (and replays identically on a
    task retry — same blocks, same order, same names)."""

    def __init__(self, out: str, key: str, nshards: int, done: frozenset):
        self.out = Path(out)
        self.key = key
        self.nshards = nshards
        self.done = np.fromiter(done, dtype=np.int64) if done else None
        self.tag: str | None = None  # resolved lazily INSIDE the task —
        # the pickled instance is deserialized per task, so a driver-side
        # tag would be shared by every task and collide
        self.seq = 0

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.tag is None:
            self.tag = _task_tag()
        sid = _shard_of(t[self.key].to_numpy(zero_copy_only=False),
                        self.nshards)
        if self.done is not None:
            keep = ~np.isin(sid, self.done)
            t = t.filter(pa.array(keep))
            sid = sid[keep]
        recs: list[tuple[int, str, int]] = []
        if t.num_rows:
            order = np.argsort(sid, kind="stable")
            t = t.take(order)
            sid = sid[order]
            bounds = np.flatnonzero(np.diff(sid, prepend=-1))
            bounds = np.append(bounds, len(sid))
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                s = int(sid[lo])
                sub = t.slice(lo, hi - lo).sort_by(self.key)
                sdir = self.out / f"shard={s:04d}"
                sdir.mkdir(parents=True, exist_ok=True)
                name = f"part-{self.tag}-{self.seq:05d}.parquet"
                self.seq += 1
                tmp = sdir / f".{name}.tmp-{os.getpid()}"
                pq.write_table(sub, tmp, row_group_size=65536)
                tmp.rename(sdir / name)  # idempotent on task retry
                recs.append((s, name, hi - lo))
        return pa.table({
            "shard": pa.array([r[0] for r in recs], pa.int32()),
            "file": pa.array([r[1] for r in recs], pa.string()),
            "rows": pa.array([r[2] for r in recs], pa.int64())})


def write_sharded(ds: "object", out_dir: "str | Path", key: str,
                  nshards: int = 64) -> dict:
    """Stream ``ds`` under ``out_dir/shard=NNNN/`` partitioned by
    ``hash(key) % nshards``; skip shards already marked ``_SUCCESS``.
    Returns ``{"written": [...], "skipped": [...], "rows_written": n}``
    (``written`` = shards that received rows this run; every shard —
    including empty ones — carries a marker afterwards).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = finished_shards(out)
    # clear orphan parts of unfinished shards (a crashed prior attempt
    # may have left partial files that no manifest covers)
    for sdir in out.glob("shard=*"):
        if int(sdir.name.split("=")[1]) not in done:
            shutil.rmtree(sdir)

    writer = _BlockWriter(str(out), key, nshards, frozenset(done))
    # accounting rows are tiny (one per (block, shard) slice) — at very
    # large scale raise nshards with the cluster so per-shard file
    # counts, not this frame, are the sizing lever
    recs = ds.map_batches(writer, batch_format="pyarrow").to_pandas()

    per_shard: dict[int, dict] = {}
    for s, f, n in recs.itertuples(index=False):
        e = per_shard.setdefault(int(s), {"files": [], "rows": 0})
        e["files"].append(str(f))
        e["rows"] += int(n)
    # seal EVERY not-yet-finished shard — zero-row shards included, so a
    # completed export is fully marked and re-runs short-circuit
    for s in range(nshards):
        if s in done:
            continue
        e = per_shard.get(s, {"files": [], "rows": 0})
        sdir = out / f"shard={s:04d}"
        sdir.mkdir(parents=True, exist_ok=True)
        (sdir / "_MANIFEST.json").write_text(json.dumps(
            {"shard": s, "rows": e["rows"], "files": sorted(e["files"])},
            indent=0, sort_keys=True))
        (sdir / "_SUCCESS").touch()  # marker LAST

    written = sorted(s for s, e in per_shard.items() if e["rows"] > 0)
    return {"written": written, "skipped": sorted(done),
            "rows_written": int(recs["rows"].sum()) if len(recs) else 0}
