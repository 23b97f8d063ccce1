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


class TestInterchangeFormats:
    """CSV/JSONL clips sources (S5 plugin surface): base64 payloads
    normalize into the canonical schema; format autodetect routes by
    extension and unions mixed inputs."""

    @pytest.fixture(scope="class")
    def corpus_files(self, tmp_path_factory):
        import base64
        import json

        import pyarrow.parquet as pq

        from mail_deduplicate_ray import synth
        tbl, _ = synth.generate_clips(30, seed=5)
        d = tmp_path_factory.mktemp("interchange")
        pq.write_table(tbl, d / "clips.parquet")
        rows = tbl.to_pylist()
        with open(d / "clips.jsonl", "w") as f:
            for r in rows:
                r = dict(r)
                r["bytes"] = base64.b64encode(r["bytes"]).decode()
                f.write(json.dumps(r) + "\n")
        import csv as csvmod
        with open(d / "clips.csv", "w", newline="") as f:
            w = csvmod.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            for r in rows:
                r = dict(r)
                r["bytes"] = base64.b64encode(r["bytes"]).decode()
                w.writerow(r)
        return d

    def _sorted(self, ds):
        import pandas as pd
        df = ds.to_pandas().sort_values("clip_id").reset_index(drop=True)
        return df

    def test_jsonl_roundtrip_equals_parquet(self, corpus_files):
        from mail_deduplicate_ray.sources import (read_clips_jsonl,
                                                  read_clips_parquet)
        p = self._sorted(read_clips_parquet(str(corpus_files / "clips.parquet")))
        j = self._sorted(read_clips_jsonl(str(corpus_files / "clips.jsonl")))
        assert (p["clip_id"] == j["clip_id"]).all()
        assert (p["bytes"] == j["bytes"]).all()  # exact payload bytes
        assert (p["sr_hz"] == j["sr_hz"]).all()
        assert (p["transcript"] == j["transcript"]).all()

    def test_csv_roundtrip_equals_parquet(self, corpus_files):
        from mail_deduplicate_ray.sources import (read_clips_csv,
                                                  read_clips_parquet)
        p = self._sorted(read_clips_parquet(str(corpus_files / "clips.parquet")))
        c = self._sorted(read_clips_csv(str(corpus_files / "clips.csv")))
        assert (p["bytes"] == c["bytes"]).all()
        assert (p["dur_ms"] == c["dur_ms"]).all()

    def test_autodetect_union_mixed_formats(self, corpus_files):
        from mail_deduplicate_ray.sources import read_clips
        from mail_deduplicate_ray.sources import read_clips_parquet
        n_single = read_clips_parquet(
            str(corpus_files / "clips.parquet")).count()
        ds = read_clips([str(corpus_files / "clips.parquet"),
                         str(corpus_files / "clips.jsonl")])
        df = ds.to_pandas()
        assert len(df) == 2 * n_single  # both sources contribute fully

    def test_autodetect_rejects_unknown_suffix(self, corpus_files):
        from mail_deduplicate_ray.sources import read_clips
        with pytest.raises(ValueError, match="unsupported"):
            read_clips([str(corpus_files / "clips.xml")])

    def test_dedup_over_jsonl_matches_parquet(self, corpus_files):
        from mail_deduplicate_ray.config import DedupConfig
        from mail_deduplicate_ray.pipelines import neardup
        from mail_deduplicate_ray.sources import read_clips
        cfg = DedupConfig()
        r1 = neardup.dedup_clips(
            read_clips(str(corpus_files / "clips.parquet")), cfg,
            channels=("exact",))
        r2 = neardup.dedup_clips(
            read_clips(str(corpus_files / "clips.jsonl")), cfg,
            channels=("exact",))
        assert r1.stats.to_dict() == r2.stats.to_dict()


class TestInterchangeWriters:
    """JSONL/CSV sinks round-trip through their matching readers."""

    def _corpus(self):
        from mail_deduplicate_ray import synth
        tbl, _ = synth.generate_clips(20, seed=5)
        return tbl

    def _assert_roundtrip(self, orig, got):
        import pandas as pd
        a = (orig.select(["clip_id", "bytes", "sr_hz", "codec",
                          "transcript"]).to_pandas()
             .sort_values("clip_id").reset_index(drop=True))
        b = (got.to_pandas()[["clip_id", "bytes", "sr_hz", "codec",
                              "transcript"]]
             .sort_values("clip_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_jsonl_roundtrip(self, tmp_path):
        from mail_deduplicate_ray.sources.clips_io import (
            read_clips_jsonl, write_clips_jsonl)
        tbl = self._corpus()
        write_clips_jsonl(ray.data.from_arrow(tbl), str(tmp_path / "j"))
        got = read_clips_jsonl(
            sorted(str(p) for p in (tmp_path / "j").glob("*")))
        self._assert_roundtrip(tbl, got)

    def test_csv_roundtrip(self, tmp_path):
        from mail_deduplicate_ray.sources.clips_io import (
            read_clips_csv, write_clips_csv)
        tbl = self._corpus()
        write_clips_csv(ray.data.from_arrow(tbl), str(tmp_path / "c"))
        got = read_clips_csv(
            sorted(str(p) for p in (tmp_path / "c").glob("*")))
        self._assert_roundtrip(tbl, got)


def test_csv_roundtrip_preserves_nulls(tmp_path, ray_session):
    """Null payload/transcript must NOT come back as b''/'' after a CSV
    hop (unquoted empty = null, quoted "" = empty string)."""
    import pyarrow as pa

    from mail_deduplicate_ray.sources.clips_io import (read_clips_csv,
                                                       write_clips_csv)
    t = pa.table({
        "clip_id": pa.array(["a", "b"], pa.string()),
        "bytes": pa.array([None, b"xy"], pa.binary()),
        "sr_hz": pa.array([8000, 8000], pa.int32()),
        "dur_ms": pa.array([1, 1], pa.int32()),
        "codec": pa.array(["pcm_s16le", "pcm_s16le"], pa.string()),
        "transcript": pa.array([None, ""], pa.string()),
    })
    write_clips_csv(ray.data.from_arrow(t), str(tmp_path / "c"))
    got = (read_clips_csv(sorted(str(p) for p in (tmp_path / "c").glob("*")))
           .to_pandas().sort_values("clip_id").reset_index(drop=True))
    assert got.loc[0, "bytes"] is None
    assert got.loc[0, "transcript"] is None
    assert got.loc[1, "bytes"] == b"xy"
    assert got.loc[1, "transcript"] == ""


def test_payload_batch_size_scales_inverse_to_payload(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mail_deduplicate_ray.sources.clips_io import payload_batch_size

    small = tmp_path / "small.parquet"
    big = tmp_path / "big.parquet"
    # distinct payloads per row — identical values would dictionary-encode
    # and shrink the footer's uncompressed size to a single value's worth
    pq.write_table(pa.table({"id": list(range(64)),
                             "bytes": [bytes([i]) * 1_000
                                       for i in range(64)]}), small)
    pq.write_table(pa.table({"id": list(range(64)),
                             "bytes": [bytes([i]) * 1_000_000
                                       for i in range(64)]}), big)
    bs_small = payload_batch_size(small, target_bytes=8 << 20)
    bs_big = payload_batch_size(big, target_bytes=8 << 20)
    assert bs_small == 1024          # tiny payloads -> hi cap
    assert bs_big < bs_small         # big payloads -> smaller batches
    assert 8 <= bs_big <= 16         # ~8MB / 1MB, floored at lo
    # missing column and empty file fall back to lo
    pq.write_table(pa.table({"id": [1]}), tmp_path / "nocol.parquet")
    assert payload_batch_size(tmp_path / "nocol.parquet") == 16


class TestShardedWriter:
    def _docs(self, n=400):
        import numpy as np
        rng = np.random.default_rng(9)
        return pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc {i} " + "x" * int(rng.integers(5, 40))
                              for i in range(n)], pa.string())})

    def test_write_read_roundtrip_and_markers(self, tmp_path):
        import json
        import pyarrow.parquet as pq
        import ray.data
        from mail_deduplicate_ray.sources import sharded
        t = self._docs()
        res = sharded.write_sharded(ray.data.from_arrow(t),
                                    tmp_path, "doc_id", nshards=16)
        assert res["skipped"] == [] and res["rows_written"] == t.num_rows
        # EVERY shard is sealed — zero-row ones included — so a finished
        # export is fully marked and a re-run short-circuits entirely
        assert sharded.finished_shards(tmp_path) == set(range(16))
        assert set(res["written"]) <= set(range(16))
        # per-shard manifests account for every part file + row
        for s in range(16):
            sdir = tmp_path / f"shard={s:04d}"
            man = json.loads((sdir / "_MANIFEST.json").read_text())
            parts = sorted(p.name for p in sdir.glob("part-*.parquet"))
            assert man["files"] == parts
            assert man["rows"] == sum(
                pq.read_metadata(sdir / p).num_rows for p in parts)
        # hive-style shard= dirs surface as a partition column (a
        # pruning feature); the payload columns round-trip exactly
        back = pq.read_table(str(tmp_path)) \
            .select(["doc_id", "text"]).sort_by("doc_id")
        assert back.equals(t)

    def test_resume_skips_finished_shards(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data
        from mail_deduplicate_ray.sources import sharded
        t = self._docs()
        r1 = sharded.write_sharded(ray.data.from_arrow(t),
                                   tmp_path, "doc_id", nshards=16)
        # simulate a failed run: one shard never finished (orphan part
        # left behind, no marker)
        victim = r1["written"][3]
        vdir = tmp_path / f"shard={victim:04d}"
        (vdir / "_SUCCESS").unlink()
        (vdir / "_MANIFEST.json").unlink()
        mtimes = {p: p.stat().st_mtime_ns
                  for p in tmp_path.glob("shard=*/part-*.parquet")
                  if p.parent != vdir}
        r2 = sharded.write_sharded(ray.data.from_arrow(t),
                                   tmp_path, "doc_id", nshards=16)
        assert r2["written"] == [victim]
        assert set(r2["skipped"]) == set(range(16)) - {victim}
        # untouched shards were NOT rewritten
        for p, m in mtimes.items():
            assert p.stat().st_mtime_ns == m, p
        # hive-style shard= dirs surface as a partition column (a
        # pruning feature); the payload columns round-trip exactly
        back = pq.read_table(str(tmp_path)) \
            .select(["doc_id", "text"]).sort_by("doc_id")
        assert back.equals(t)

    def test_shard_contents_independent_of_parallelism(self, tmp_path):
        import pyarrow.parquet as pq
        import ray.data
        from mail_deduplicate_ray.sources import sharded
        t = self._docs()
        a_dir, b_dir = tmp_path / "a", tmp_path / "b"
        sharded.write_sharded(ray.data.from_arrow(t),
                              a_dir, "doc_id", nshards=8)
        sharded.write_sharded(
            ray.data.from_arrow(t).repartition(13),
            b_dir, "doc_id", nshards=8)
        # the part-file LAYOUT is block-structure-dependent (streaming
        # writer), the per-shard ROW CONTENT is not
        for s in range(8):
            ta = pq.read_table(str(a_dir / f"shard={s:04d}")) \
                .sort_by("doc_id")
            tb = pq.read_table(str(b_dir / f"shard={s:04d}")) \
                .sort_by("doc_id")
            assert ta.equals(tb), s

    def test_shard_larger_than_one_block_streams_parts(self, tmp_path):
        # a single shard fed from MANY blocks must accumulate multiple
        # part files (bounded task memory) and still resume correctly
        import pyarrow.parquet as pq
        import ray.data
        from mail_deduplicate_ray.sources import sharded
        t = self._docs(n=600)
        ds = ray.data.from_arrow(t).repartition(12)
        sharded.write_sharded(ds, tmp_path, "doc_id", nshards=2)
        multi = [s for s in range(2) if len(list(
            (tmp_path / f"shard={s:04d}").glob("part-*.parquet"))) > 1]
        assert multi, "expected per-block parts within one shard"
        # wipe one shard's markers: resume rebuilds only it, and the
        # orphan parts it left are cleared, not double-counted
        vdir = tmp_path / f"shard={multi[0]:04d}"
        (vdir / "_SUCCESS").unlink()
        (vdir / "_MANIFEST.json").unlink()
        r2 = sharded.write_sharded(ray.data.from_arrow(t).repartition(5),
                                   tmp_path, "doc_id", nshards=2)
        assert r2["written"] == [multi[0]]
        back = pq.read_table(str(tmp_path)) \
            .select(["doc_id", "text"]).sort_by("doc_id")
        assert back.equals(t)

    def test_empty_shards_marked_finished(self, tmp_path):
        # an export whose data touches few shards still seals ALL of
        # them, so the re-run rewrites nothing (ADVICE round-4 item)
        import ray.data
        from mail_deduplicate_ray.sources import sharded
        t = self._docs(n=3)
        sharded.write_sharded(ray.data.from_arrow(t),
                              tmp_path, "doc_id", nshards=32)
        assert sharded.finished_shards(tmp_path) == set(range(32))
        r2 = sharded.write_sharded(ray.data.from_arrow(t),
                                   tmp_path, "doc_id", nshards=32)
        assert r2["written"] == [] and r2["rows_written"] == 0
        assert set(r2["skipped"]) == set(range(32))
