"""Clips table I/O.

The production store is Lance (BASELINE.json input_hint: "Lance table of
audio clip + transcript pairs"); the sandbox has no ``lance`` package, so
the Lance reader is import-gated with a parquet fallback that preserves the
identical schema.  Readers validate/coerce the schema (S1/S2 analogue:
format autodetect is a schema check, not filesystem sniffing —
ref: mail_box.py:353-397).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

def read_parquet_clean(paths, columns: list[str] | None = None,
                       **read_kwargs) -> "ray.data.Dataset":
    """read_parquet with schema metadata stripped (pandas-written parquet
    carries dict-valued metadata that defeats Ray's schema hashing and
    spams 'Failed to hash the schemas' worker warnings).

    Preferred path: pass an explicit metadata-free ``schema=`` so the
    READ operator itself emits clean blocks (no extra strip stage, no
    warning from inside the read tasks).  Falls back to a zero-copy
    strip map when the schema can't be pre-read (remote URIs,
    mixed-schema directories)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    schema = read_kwargs.pop("schema", None)
    if schema is None:
        first = paths[0] if isinstance(paths, (list, tuple)) else paths
        try:
            p = Path(str(first))
            if p.is_dir():
                frags = sorted(p.rglob("*.parquet"))
                p = frags[0] if frags else None
            schema = pq.read_schema(str(p)) if p and p.exists() else None
        except Exception:  # noqa: BLE001 - fall back to the strip map
            schema = None
    if schema is not None and columns:
        if set(columns) <= set(schema.names):
            schema = pa.schema([schema.field(c) for c in columns])
        else:
            schema = None
    if schema is not None:
        return ray.data.read_parquet(paths, columns=columns,
                                     schema=schema.remove_metadata(),
                                     **read_kwargs)
    ds = ray.data.read_parquet(paths, columns=columns, **read_kwargs)
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow")


CLIPS_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr_hz", pa.int32()),
    ("dur_ms", pa.int32()),
    ("codec", pa.string()),
    ("transcript", pa.string()),
])
OPTIONAL_COLUMNS = {"ingest_ts": pa.float64()}


def _validate(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    names = set(ds.schema().names)
    missing = {f.name for f in CLIPS_SCHEMA} - names
    if missing:
        raise ValueError(f"clips table missing columns: {sorted(missing)}")
    return ds


def read_clips_fast(paths, columns: list[str] | None = None,
                    ) -> "ray.data.Dataset":
    """Parallel clips read: one pyarrow ``read_row_group`` task per row
    group, fanned out via map_batches over a (path, row_group) spec table.

    Ray's generic parquet datasource re-batches/re-slices large-binary
    columns with heavy copying — measured ~50x the CPU of a raw pyarrow
    read on the audio-payload corpus (745 CPU-s vs 17 for 3.6 GB).  This
    reader keeps the datasource layer out of the hot path; parallelism =
    row groups, so the WRITER's row-group size controls block size (the
    corpus cache and checkpoint writers emit ~100k-row files with default
    ~64 MB row groups).  Falls back to the generic reader when no local
    .parquet files match (e.g. remote URIs)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    if isinstance(paths, (str, Path)):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        pth = Path(p)
        if pth.is_dir():
            files.extend(sorted(str(f) for f in pth.rglob("*.parquet")))
        elif pth.suffix == ".parquet" and pth.exists():
            files.append(str(pth))
        else:
            return read_parquet_clean([str(x) for x in paths],
                                      columns=columns)
    if not files:
        return read_parquet_clean([str(x) for x in paths], columns=columns)

    spec_path, spec_rg = [], []
    for f in files:
        for rg in range(pq.ParquetFile(f).metadata.num_row_groups):
            spec_path.append(f)
            spec_rg.append(rg)
    # one BLOCK per spec row: the downstream map runs one task per row
    # group (without this the single spec block becomes one serial task)
    specs = ray.data.from_arrow(pa.table({"path": spec_path,
                                          "rg": spec_rg}))
    specs = specs.repartition(len(spec_path))

    # batch_size=1 -> exactly one (path, rg) spec per call; emitted as its
    # own block.  A callable-class ACTOR pool, not a task map: a task map
    # would fuse into the downstream signature actor stage, inherit its
    # larger batch_size, and coalesce every spec into one serial task.
    # small reader pool: row-group reads are fast (~0.2 s each); a pool
    # sized to the cluster would add ~30 actor startups and steal CPU from
    # the downstream signature pool (measured regression)
    from mail_deduplicate_ray.stages.bucketing import pool_size
    _, hi = pool_size()
    readers = max(2, min(8, hi // 4))
    return specs.map_batches(_RowGroupReader,
                             fn_constructor_args=(columns,),
                             batch_size=1, batch_format="pyarrow",
                             concurrency=(1, readers))


class _RowGroupReader:
    def __init__(self, columns: list[str] | None) -> None:
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        t = pq.ParquetFile(batch["path"][0].as_py()).read_row_group(
            batch["rg"][0].as_py(), columns=self.columns)
        return t.replace_schema_metadata(None)


def check_sources(paths: list[str]) -> list[str]:
    """Reject the same source given twice (≙ the duplicate-box hard error,
    ref: deduplicate.py:936-956): dedup by resolved path, raise on repeat."""
    from pathlib import Path
    seen: dict[str, str] = {}
    for p in paths:
        rp = str(Path(p).expanduser().resolve())
        if rp in seen:
            raise ValueError(
                f"duplicate input source: {p!r} resolves to the same path "
                f"as {seen[rp]!r} — each source may be given once")
        seen[rp] = p
    return list(seen)


def read_clips_parquet(paths: str | list[str],
                       columns: list[str] | None = None) -> "ray.data.Dataset":
    if isinstance(paths, list):
        paths = check_sources(paths)
    return _validate(read_clips_fast(paths, columns=columns))


def read_clips_lance(uri: str,
                     columns: list[str] | None = None) -> "ray.data.Dataset":
    """Lance scan when the lance package is present; parquet fallback
    otherwise (same schema either way)."""
    try:
        import lance  # noqa: F401
    except ImportError:
        return read_clips_parquet(uri, columns)
    return _validate(ray.data.read_lance(uri, columns=columns))


def write_clips(ds: "ray.data.Dataset", out_dir: str,
                min_rows_per_file: int = 100_000) -> None:
    """Partitioned parquet sink (one part per block; resumable layout —
    rerun skips by comparing manifest, see state/checkpoint.py)."""
    try:
        ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray: num_rows_per_file
        ds.write_parquet(out_dir, num_rows_per_file=min_rows_per_file)


def write_clips_lance(ds: "ray.data.Dataset", uri: str) -> None:
    """Lance sink when the lance package is present (the BASELINE.json
    production store); parquet fallback otherwise — same contract as
    read_clips_lance, so a round-trip works in either environment."""
    try:
        import lance  # noqa: F401
    except ImportError:
        write_clips(ds, uri)
        return
    ds.write_lance(uri)


def _b64_interchange(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Inverse of _normalize_interchange: binary payload -> base64 string
    so text formats can carry it."""
    import base64

    def f(t: pa.Table) -> pa.Table:
        if "bytes" not in t.column_names:
            return t
        enc = pa.array(
            [base64.b64encode(v).decode() if v is not None else None
             for v in t["bytes"].to_pylist()], pa.string())
        return t.set_column(t.schema.get_field_index("bytes"), "bytes", enc)

    return ds.map_batches(f, batch_format="pyarrow")


def write_clips_jsonl(ds: "ray.data.Dataset", out_dir: str) -> None:
    """JSONL sink (one part file per block, payload base64) — the
    write-side of the S5 interchange surface; read_clips_jsonl
    round-trips it."""
    _b64_interchange(ds).write_json(out_dir)


def write_clips_csv(ds: "ray.data.Dataset", out_dir: str) -> None:
    """CSV sink (header row, payload base64); read_clips_csv
    round-trips it EXACTLY including the null/empty-string distinction:
    non-null strings are always quoted on write, and the reader treats
    only UNQUOTED empties as null."""
    def _opts() -> dict:
        # built lazily on the worker: WriteOptions is not picklable
        from pyarrow import csv as pacsv
        return {"write_options":
                pacsv.WriteOptions(quoting_style="all_valid")}

    _b64_interchange(ds).write_csv(out_dir, arrow_csv_args_fn=_opts)


# --- interchange source formats (the S5 source-plugin surface) -------------
# CSV / JSONL clips corpora: `bytes` travels base64-encoded (neither
# format carries raw binary); rows are normalized into the canonical
# CLIPS_SCHEMA so every downstream stage is format-agnostic.  Missing
# optional columns default like the parquet path (null ingest_ts).


def _normalize_interchange(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    import base64

    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        cols = {}
        names = set(t.column_names)
        raw = t["bytes"] if "bytes" in names else None
        if raw is not None and pa.types.is_binary(raw.type):
            payload = raw
        elif raw is not None:
            payload = pa.array(
                [base64.b64decode(v) if v is not None else None
                 for v in raw.to_pylist()], pa.binary())
        else:
            payload = pa.nulls(t.num_rows, pa.binary())
        cols["clip_id"] = pc.cast(t["clip_id"], pa.string())
        cols["bytes"] = payload
        cols["sr_hz"] = pc.cast(t["sr_hz"], pa.int32())
        cols["dur_ms"] = pc.cast(t["dur_ms"], pa.int32())
        cols["codec"] = pc.cast(t["codec"], pa.string())
        cols["transcript"] = pc.cast(t["transcript"], pa.string())
        if "ingest_ts" in names:
            cols["ingest_ts"] = pc.cast(t["ingest_ts"], pa.float64())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def read_clips_jsonl(paths: str | list[str]) -> "ray.data.Dataset":
    """JSONL clips source: one JSON object per line, ``bytes`` base64."""
    if isinstance(paths, list):
        paths = check_sources(paths)
    return _validate(_normalize_interchange(ray.data.read_json(paths)))


def read_clips_csv(paths: str | list[str]) -> "ray.data.Dataset":
    """CSV clips source: header row, ``bytes`` column base64.  Unquoted
    empty fields are nulls (quoted "" stays an empty string), matching
    the writer's quoting contract — without this, a null payload or
    transcript silently reads back as b''/'' (round-trip corruption)."""
    from pyarrow import csv as pacsv

    if isinstance(paths, list):
        paths = check_sources(paths)
    conv = pacsv.ConvertOptions(strings_can_be_null=True,
                                quoted_strings_can_be_null=False)
    return _validate(_normalize_interchange(
        ray.data.read_csv(paths, convert_options=conv)))


_FORMAT_READERS = {
    ".parquet": read_clips_parquet,
    ".jsonl": read_clips_jsonl,
    ".json": read_clips_jsonl,
    ".csv": read_clips_csv,
    ".lance": None,  # resolved lazily (import-gated)
}


def read_clips(paths: str | list[str]) -> "ray.data.Dataset":
    """Format-autodetecting clips reader (S2 analogue: suffix + schema
    check, ref: mail_box.py:353-397): routes each input by extension;
    mixing formats in one call unions the normalized Datasets."""
    from pathlib import Path
    plist = [paths] if isinstance(paths, (str, Path)) else list(paths)
    plist = check_sources([str(p) for p in plist])
    groups: dict[str, list[str]] = {}
    for p in plist:
        suf = Path(p).suffix.lower()
        if Path(p).is_dir():
            suf = ".parquet"  # directory of fragments
        if suf not in _FORMAT_READERS:
            raise ValueError(f"unsupported clips source format {suf!r} "
                             f"for {p!r} (supported: "
                             f"{sorted(_FORMAT_READERS)})")
        groups.setdefault(suf, []).append(p)
    parts = []
    for suf, ps in groups.items():
        if suf == ".lance":
            parts.extend(read_clips_lance(p) for p in ps)
        else:
            reader = _FORMAT_READERS[suf]
            parts.append(reader(ps))
    ds = parts[0]
    for other in parts[1:]:
        ds = ds.union(other)
    return ds


def payload_batch_size(path, col: str = "bytes",
                       target_bytes: int = 8 << 20,
                       lo: int = 16, hi: int = 1024) -> int:
    """Rows-per-batch sized so one batch's PAYLOAD bytes land near
    ``target_bytes`` — tiny thumbnails batch by the hundreds, multi-MB
    masters batch in the teens.  Reads only parquet footer metadata
    (first part file of a dataset dir), so the decision costs nothing
    and adapts per corpus instead of hard-coding a row count that is
    only right for one payload size."""
    from pathlib import Path

    import pyarrow.parquet as pq

    p = Path(path)
    if p.is_dir():
        parts = sorted(p.glob("*.parquet"))
        if not parts:
            return lo
        p = parts[0]
    md = pq.ParquetFile(p).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    if col not in names:
        return lo
    idx = names.index(col)
    tot = rows = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        tot += g.column(idx).total_uncompressed_size
        rows += g.num_rows
    if rows == 0 or tot == 0:
        return lo
    return int(min(hi, max(lo, target_bytes * rows // tot)))
