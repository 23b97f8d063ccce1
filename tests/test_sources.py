"""Source readers: schema validation (S2 format-autodetect analogue) and
the Lance import gate's parquet fallback."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from mail_deduplicate_ray import synth
from mail_deduplicate_ray.sources import (read_clips_lance,
                                          read_clips_parquet, write_clips)


def _corpus_file(tmp_path, n=20):
    tbl, _ = synth.generate_clips(n, seed=3)
    p = tmp_path / "clips.parquet"
    pq.write_table(tbl, p)
    return p, tbl


def test_read_validates_schema(tmp_path):
    p, tbl = _corpus_file(tmp_path)
    ds = read_clips_parquet(str(p))
    assert ds.count() == tbl.num_rows


def test_missing_column_rejected(tmp_path):
    bad = pa.table({"clip_id": ["a"], "bytes": [b"x"]})
    p = tmp_path / "bad.parquet"
    pq.write_table(bad, p)
    with pytest.raises(ValueError, match="missing columns"):
        read_clips_parquet(str(p))


def test_lance_gate_falls_back_to_parquet(tmp_path):
    # sandbox has no lance package -> same data via the parquet path
    p, tbl = _corpus_file(tmp_path)
    ds = read_clips_lance(str(p))
    assert ds.count() == tbl.num_rows


def test_write_clips_roundtrip(tmp_path):
    p, tbl = _corpus_file(tmp_path)
    ds = read_clips_parquet(str(p))
    out = tmp_path / "out"
    write_clips(ds, str(out))
    back = ray.data.read_parquet(str(out))
    assert back.count() == tbl.num_rows
    assert set(back.schema().names) == set(tbl.schema.names)


def test_write_clips_lance_gate_roundtrip(tmp_path):
    # no lance in the sandbox -> parquet fallback; read side uses the same
    # gate so the round-trip holds in either environment
    import ray.data
    from mail_deduplicate_ray import synth
    from mail_deduplicate_ray.sources import (read_clips_lance,
                                              write_clips_lance)
    tbl, _ = synth.generate_clips(8, seed=4)
    out = str(tmp_path / "clips_lance")
    write_clips_lance(ray.data.from_arrow(tbl), out)
    back = read_clips_lance(out)
    assert back.count() == tbl.num_rows
    assert set(back.schema().names) >= {"clip_id", "bytes", "transcript"}


def test_read_clips_fast_columns_pruning(tmp_path):
    import pyarrow.parquet as pq
    import ray.data
    from mail_deduplicate_ray import synth
    from mail_deduplicate_ray.sources.clips_io import read_clips_fast
    tbl, _ = synth.generate_clips(10, seed=6)
    p = tmp_path / "c.parquet"
    pq.write_table(tbl, str(p))
    ds = read_clips_fast(str(p), columns=["clip_id", "dur_ms"])
    assert set(ds.schema().names) == {"clip_id", "dur_ms"}
    assert ds.count() == tbl.num_rows
    # dir-of-files path
    d = tmp_path / "dir"; d.mkdir()
    pq.write_table(tbl.slice(0, 5), str(d / "a.parquet"))
    pq.write_table(tbl.slice(5), str(d / "b.parquet"))
    assert read_clips_fast(str(d)).count() == tbl.num_rows
