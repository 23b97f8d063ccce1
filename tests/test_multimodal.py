"""Multimodal stub plumbing: schemas, actor signature, rejection rows,
payload-drop — real; pixel decode stubbed (no image/video libs here)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mail_deduplicate_ray.stages.multimodal import (ImageDecodeStage,
                                                    VideoFrameSampleStage)


def _images(n=10):
    return ray.data.from_arrow(pa.table({
        "id": [f"img{i}" for i in range(n)],
        "bytes": [b"\x89PNG" + bytes([i]) * 32 if i % 4 else b""
                  for i in range(n)],
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
        "fmt": ["png"] * n,
    }))


def test_real_decode_stubbed():
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(real_decode=True)
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(real_decode=True)


def test_image_stage_plumbing():
    out = _images().map_batches(
        ImageDecodeStage, fn_constructor_args=(64,),
        batch_format="pyarrow", batch_size=4, concurrency=2)
    t = pa.concat_tables(out.iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
    assert "bytes" not in t.schema.names  # payload dropped (dehydration)
    assert t.num_rows == 10
    embs = t["embedding"].to_pylist()
    assert all(len(e) == 64 for e in embs)
    # empty payloads -> rejection rows, never exceptions
    bad = t.filter(pa.compute.invert(t["decode_ok"]))
    assert bad.num_rows == 3  # i in {0,4,8}
    assert set(bad["decode_reason"].to_pylist()) == {"empty_payload"}
    # deterministic featurizer: same content -> same embedding
    again = pa.concat_tables(
        _images().map_batches(ImageDecodeStage, fn_constructor_args=(64,),
                              batch_format="pyarrow", batch_size=4,
                              concurrency=2)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    np.testing.assert_array_equal(np.asarray(embs, dtype=np.float32),
                                  np.asarray(again["embedding"].to_pylist(),
                                             dtype=np.float32))


def test_video_stage_plumbing():
    vids = ray.data.from_arrow(pa.table({
        "id": ["v0", "v1", "v2"],
        "bytes": [b"FAKE" * 100, b"", b"MP4!" * 50],
        "fps": pa.array([30.0, 30.0, 24.0], pa.float32()),
        "n_frames": pa.array([100, 0, 2], pa.int32()),
        "fmt": ["mp4"] * 3,
    }))
    out = vids.map_batches(VideoFrameSampleStage, fn_constructor_args=(4, 32),
                           batch_format="pyarrow", batch_size=2, concurrency=2)
    t = pa.concat_tables(out.iter_batches(batch_size=None,
                                           batch_format="pyarrow"))
    assert "bytes" not in t.schema.names
    rows = {r["id"]: r for r in t.to_pylist()}
    assert len(rows["v0"]["frame_embeddings"]) == 4  # uniform sample of 100
    assert rows["v0"]["frame_indices"] == [0, 33, 66, 99]
    assert rows["v1"]["decode_ok"] is False
    assert len(rows["v2"]["frame_embeddings"]) == 2  # clamped to n_frames
