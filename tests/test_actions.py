"""Action matrix over verbs x targets (ref: tests/test_action.py:82) +
dedup-storage gate + dry-run leaves no output."""

import pyarrow.parquet as pq
import pytest
import ray.data

from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.pipelines import actions, neardup


@pytest.fixture(scope="module")
def result(small_corpus):
    tbl, _ = small_corpus
    return neardup.dedup_clips(ray.data.from_arrow(tbl), DedupConfig())


def _rows(path):
    return sum(pq.ParquetFile(p).metadata.num_rows
               for p in sorted(path.glob("*.parquet")))


@pytest.mark.parametrize("target", ["selection", "discard"])
def test_copy_matrix(result, tmp_path, target):
    rep = actions.copy_action(result, target, tmp_path / "out")
    assert rep.rows == _rows(tmp_path / "out")
    d = result.stats.to_dict()
    expect = d["mail_discarded"] if target == "discard" else \
        d["mail_retained"] - d["mail_discarded"]
    assert rep.rows == expect


def test_dry_run_no_io(result, tmp_path):
    # ref: action.py:66-72 — counters increment, no I/O
    rep = actions.copy_action(result, "discard", tmp_path / "out", dry_run=True)
    assert rep.dry_run and rep.rows > 0
    assert not (tmp_path / "out").exists()


def test_move_emits_tombstones(result, tmp_path):
    rep = actions.move_action(result, "discard", tmp_path / "moved")
    assert (tmp_path / "moved.tombstones").exists()
    assert _rows(tmp_path / "moved.tombstones") == rep.rows


def test_delete_writes_manifest_only(result, tmp_path):
    rep = actions.delete_action(result, "discard", tmp_path / "deleted")
    t = pq.read_table(str(tmp_path / "deleted"))
    assert t.column_names == ["clip_id"]
    assert t.num_rows == rep.rows


def test_dedup_storage_gate(result, tmp_path):
    # byte-equality gate: only discarded rows whose exact_key matches the
    # winner's may share a blob (ref: hardlink_blocker action.py:156-192)
    gated = actions.dedup_storage_action(result, tmp_path / "g", dry_run=True)
    free = actions.dedup_storage_action(result, tmp_path / "f",
                                        allow_differing=True, dry_run=True)
    assert gated.rows <= free.rows
    assert free.rows == result.stats["mail_discarded"]
    rep = actions.dedup_storage_action(result, tmp_path / "links")
    t = pq.read_table(str(tmp_path / "links"))
    assert set(t.column_names) == {"clip_id", "blob_ref"}
    assert t.num_rows == gated.rows


def test_transcode_normalizes_codec_and_rate(result, small_corpus, tmp_path):
    import numpy as np

    from mail_deduplicate_ray import codecs

    tbl, _ = small_corpus
    src = ray.data.from_arrow(tbl)
    rep = actions.transcode_action(result, src, tmp_path / "norm",
                                   codec="pcm_s16le", target_sr=8000)
    assert rep.rows > 0 and rep.extra["codec"] == "pcm_s16le"
    out = pq.read_table(tmp_path / "norm")
    ok = out.filter(out["transcoded"])
    assert ok.num_rows > 0
    assert set(ok["codec"].to_pylist()) == {"pcm_s16le"}
    assert set(ok["sr_hz"].to_pylist()) == {8000}
    # kept selection only
    kept = result.settled.to_pandas()
    kept_ids = set(kept.loc[kept["keep"], "clip_id"])
    assert set(out["clip_id"].to_pylist()) <= kept_ids
    assert rep.rows == len(kept_ids)
    # round-trip: decoded output is real audio at the new rate (duration
    # preserved within a frame)
    src_rows = {cid: (b, sr) for cid, b, sr in zip(
        tbl["clip_id"].to_pylist(), tbl["bytes"].to_pylist(),
        tbl["sr_hz"].to_pylist())}
    row = ok.slice(0, 1).to_pylist()[0]
    pcm, sr = codecs.decode(row["bytes"])
    assert sr == 8000
    ob, osr = src_rows[row["clip_id"]]
    opcm, _ = codecs.decode(ob)
    assert abs(len(pcm) / sr - len(opcm) / osr) < 0.01
    assert np.max(np.abs(pcm)) > 0


def test_transcode_malformed_passthrough(result, tmp_path):
    import pyarrow as pa

    src = ray.data.from_arrow(pa.table({
        "clip_id": pa.array([r["clip_id"] for r in
                             result.settled.take_all() if r["keep"]][:1],
                            pa.string()),
        "bytes": pa.array([b"garbage"], pa.binary()),
        "codec": pa.array(["pcm_s16le"], pa.string()),
    }))
    rep = actions.transcode_action(result, src, tmp_path / "bad")
    out = pq.read_table(tmp_path / "bad")
    assert rep.rows == 1
    assert out["transcoded"].to_pylist() == [False]
    assert out["bytes"].to_pylist() == [b"garbage"]


def test_transcode_unknown_codec_rejected(result, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="codec"):
        actions._TranscodeStage("mp3", None)


def test_copy_append_roundtrip(result, tmp_path):
    """Append-mode export (≙ create_box append, ref: mail_box.py:490-511):
    a second copy into the same dir ADDS generation-stamped parts; the
    union reads back with a plain directory read and the manifest records
    per-generation lineage."""
    import json

    out = tmp_path / "ds"
    r1 = actions.copy_action(result, "selection", out, append=True)
    r2 = actions.copy_action(result, "discard", out, append=True)
    got = pq.read_table(out)  # _manifest.json is reader-ignored
    assert got.num_rows == r1.rows + r2.rows
    ids = got["clip_id"].to_pylist()
    assert len(set(ids)) == len(ids)  # selection and discard are disjoint
    man = json.loads((out / "_manifest.json").read_text())
    assert [g["id"] for g in man["generations"]] == [0, 1]
    assert man["generations"][0]["rows"] == r1.rows
    assert man["generations"][1]["rows"] == r2.rows
    for g in man["generations"]:
        for f in g["files"]:
            assert (out / f).exists()


def test_copy_append_vs_replace(result, tmp_path):
    out = tmp_path / "ds"
    r1 = actions.copy_action(result, "selection", out, append=True)
    assert pq.read_table(out).num_rows == r1.rows
    # replace mode wipes the dir (manifest and all generations gone)
    r2 = actions.copy_action(result, "selection", out)
    assert pq.read_table(out).num_rows == r2.rows == r1.rows
    assert not (out / "_manifest.json").exists()


def test_move_append_tombstones(result, tmp_path):
    out = tmp_path / "moved"
    r1 = actions.move_action(result, "discard", out, append=True)
    r2 = actions.move_action(result, "discard", out, append=True)
    tomb = tmp_path / "moved.tombstones"
    assert pq.read_table(out).num_rows == r1.rows + r2.rows
    assert pq.read_table(tomb).num_rows == r1.rows + r2.rows
