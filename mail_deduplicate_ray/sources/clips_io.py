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
    spams 'Failed to hash the schemas' worker warnings; the strip is
    zero-copy and fuses with the downstream transform)."""
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
    return _validate(ray.data.read_parquet(paths, columns=columns))


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
