"""Multimodal stages: Ray plumbing (schemas, actor signature, rejection
rows, payload-drop) + REAL pure-numpy pixel decode (BMP/PPM/PGM/PNG
images, Y4M video — functions/imaging.py); JPEG stays a rejection row
(external codec needed in this sandbox)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from mail_deduplicate_ray.functions import imaging
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


def _rng_img(seed, h=48, w=64):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


class TestImagingKernels:
    def test_bmp_roundtrip_exact(self):
        img = _rng_img(1)
        got = imaging.decode_bmp(imaging.encode_bmp(img))
        np.testing.assert_array_equal(img, got)

    def test_bmp_row_padding(self):
        # width 3 -> 9-byte rows padded to 12: padding must not leak
        img = _rng_img(2, h=5, w=3)
        np.testing.assert_array_equal(
            img, imaging.decode_bmp(imaging.encode_bmp(img)))

    def test_bmp_truncated_raises(self):
        data = imaging.encode_bmp(_rng_img(3))
        with pytest.raises(ValueError, match="truncated"):
            imaging.decode_bmp(data[:100])
        with pytest.raises(ValueError, match="not a BMP"):
            imaging.decode_bmp(b"nope")

    def test_netpbm_roundtrip(self):
        img = _rng_img(4)
        np.testing.assert_array_equal(
            img, imaging.decode_netpbm(imaging.encode_ppm(img)))
        gray = _rng_img(5)[:, :, 0]
        np.testing.assert_array_equal(
            gray, imaging.decode_netpbm(imaging.encode_ppm(gray)))

    def test_netpbm_comment_header(self):
        img = _rng_img(6, h=4, w=4)
        raw = imaging.encode_ppm(img)
        commented = b"P6\n# a comment\n4 4 255\n" + raw.split(b"\n", 1)[1]
        np.testing.assert_array_equal(img, imaging.decode_netpbm(commented))

    def test_y4m_frame_offset_decode(self):
        frames = np.stack([np.full((16, 32), i * 10, np.uint8)
                           for i in range(8)])
        data = imaging.encode_y4m(frames, fps=30)
        assert imaging.y4m_frame_count(data) == 8
        for k in (0, 3, 7):
            np.testing.assert_array_equal(frames[k],
                                          imaging.decode_y4m_frame(data, k))
        with pytest.raises(ValueError, match="out of range"):
            imaging.decode_y4m_frame(data, 8)

    def test_dhash_perceptual(self):
        # gradient image: brightness shift barely moves the dhash;
        # a different image is far away
        base = np.tile(np.arange(64, dtype=np.float32) * 4, (48, 1))
        shifted = np.clip(base + 10.0, 0, 255)
        other = imaging.to_gray(_rng_img(7))
        h0, h1 = imaging.dhash64(base), imaging.dhash64(shifted)
        h2 = imaging.dhash64(other)
        assert bin(h0 ^ h1).count("1") <= 4
        assert bin(h0 ^ h2).count("1") >= 16

    def test_tiny_embedding_normalized(self):
        e = imaging.tiny_embedding(imaging.to_gray(_rng_img(8)))
        assert e.shape == (64,)
        assert abs(float(np.linalg.norm(e)) - 1.0) < 1e-5

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_png_roundtrip_all_filters(self, filter_type):
        rgb = _rng_img(11, h=23, w=31)
        gray = _rng_img(12, h=9, w=17)[:, :, 0]
        rgba = np.random.default_rng(13).integers(
            0, 256, (12, 7, 4), dtype=np.uint8)
        for img in (rgb, gray, rgba):
            got = imaging.decode_png(imaging.encode_png(img, filter_type))
            np.testing.assert_array_equal(img, got)

    def test_png_palette(self):
        import struct
        import zlib
        rng = np.random.default_rng(14)
        pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
        idx = rng.integers(0, 5, (6, 8), dtype=np.uint8)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
        png = (imaging._PNG_SIG
               + imaging._png_chunk(b"IHDR",
                                    struct.pack(">IIBBBBB", 8, 6, 8, 3,
                                                0, 0, 0))
               + imaging._png_chunk(b"PLTE", pal.tobytes())
               + imaging._png_chunk(b"IDAT", zlib.compress(raw))
               + imaging._png_chunk(b"IEND", b""))
        np.testing.assert_array_equal(pal[idx], imaging.decode_png(png))

    def test_png_corruption_rejected(self):
        data = bytearray(imaging.encode_png(_rng_img(15)))
        data[60] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError, match="CRC mismatch"):
            imaging.decode_png(bytes(data))
        with pytest.raises(ValueError, match="not a PNG"):
            imaging.decode_png(b"\x89PNX junk")
        good = imaging.encode_png(_rng_img(15))
        with pytest.raises(ValueError, match="truncated"):
            imaging.decode_png(good[:-10])

    @pytest.mark.parametrize("sub,min_psnr", [("444", 38), ("420", 27)])
    def test_jpeg_roundtrip_psnr(self, sub, min_psnr):
        from mail_deduplicate_ray.functions import jpeg
        rng = np.random.default_rng(20)
        small = rng.integers(0, 256, (6, 8, 3)).astype(np.float32)
        img = np.clip(np.stack(
            [imaging.resize_bilinear(small[:, :, c], 48, 64)
             for c in range(3)], 2), 0, 255).astype(np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, sub))
        assert out.shape == img.shape and out.dtype == np.uint8
        mse = np.mean((img.astype(np.float64) - out) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) >= min_psnr

    def test_jpeg_gray_and_odd_dims(self):
        from mail_deduplicate_ray.functions import jpeg
        gray = np.clip(imaging.resize_bilinear(
            np.random.default_rng(21).integers(0, 256, (5, 7))
            .astype(np.float32), 41, 53), 0, 255).astype(np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, 90))
        assert out.shape == gray.shape
        mse = np.mean((gray.astype(np.float64) - out) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) >= 38

    def test_jpeg_restart_markers_roundtrip(self):
        from mail_deduplicate_ray.functions import jpeg
        rng = np.random.default_rng(22)
        small = rng.integers(0, 256, (6, 8, 3)).astype(np.float32)
        img = np.clip(np.stack(
            [imaging.resize_bilinear(small[:, :, c], 32, 40)
             for c in range(3)], 2), 0, 255).astype(np.uint8)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, "444"))
        for ri in (1, 3):
            got = jpeg.decode_jpeg(
                jpeg.encode_jpeg(img, 90, "444", restart_interval=ri))
            np.testing.assert_array_equal(base, got)

    def test_jpeg_rejects_unsupported(self):
        from mail_deduplicate_ray.functions import jpeg
        with pytest.raises(ValueError, match="not a JPEG"):
            jpeg.decode_jpeg(b"BM not jpeg")
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"\xff\xd8\xff\xe0 junk")
        # progressive (SOF2) refused, not mis-decoded
        good = bytearray(jpeg.encode_jpeg(
            np.zeros((8, 8), np.uint8), 90))
        sof = good.find(b"\xff\xc0")
        good[sof + 1] = 0xC2
        with pytest.raises(ValueError, match="baseline"):
            jpeg.decode_jpeg(bytes(good))

    def test_jpeg_dhash_stable_under_reencode(self):
        # the property the near-dup corpus's 'jpeg' kind relies on
        from mail_deduplicate_ray.functions import jpeg
        for seed in range(5):
            rng = np.random.default_rng((46, seed))
            small = rng.integers(0, 256, (6, 8, 3)).astype(np.float32)
            img = np.clip(np.stack(
                [imaging.resize_bilinear(small[:, :, c], 48, 64)
                 for c in range(3)], 2), 0, 255).astype(np.uint8)
            h0 = imaging.dhash64(imaging.to_gray(img))
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 95))
            h1 = imaging.dhash64(imaging.to_gray(out))
            assert bin(h0 ^ h1).count("1") <= 3

    def test_cross_format_pixels_identical(self):
        # same pixels through BMP / PPM / PNG containers -> same dhash
        img = _rng_img(16)
        hs = {imaging.dhash64(imaging.to_gray(imaging.decode_image(enc(img))))
              for enc in (imaging.encode_bmp, imaging.encode_ppm,
                          imaging.encode_png)}
        assert len(hs) == 1

    def test_decode_image_sniffs_magic(self):
        img = _rng_img(9)
        # declared format wrong -> magic wins (declared-then-sniffed)
        got = imaging.decode_image(imaging.encode_bmp(img), "jpeg_wrong")
        np.testing.assert_array_equal(img, got)
        with pytest.raises(ValueError, match="unsupported image format"):
            imaging.decode_image(b"\x00\x11\x22 not an image", "h264")
        with pytest.raises(ValueError):  # JPEG magic but corrupt stream
            imaging.decode_image(b"\xff\xd8\xff\xe0 junk", "jpg")


def test_image_stage_fake_path_plumbing():
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


def test_image_stage_real_decode():
    """REAL decode path: BMP/PPM rows decode to true tiny-image embeddings
    + dhash; a JPEG payload becomes a rejection row with a reason."""
    imgs = [_rng_img(i) for i in range(3)]
    tbl = pa.table({
        "id": ["bmp0", "bmp0-copy", "png0-copy", "ppm1", "h264-2"],
        "bytes": [imaging.encode_bmp(imgs[0]), imaging.encode_bmp(imgs[0]),
                  imaging.encode_png(imgs[0]),
                  imaging.encode_ppm(imgs[1]),
                  b"\x00\x00\x00\x01 h264 NAL soup"],
        "width": pa.array([64] * 5, pa.int32()),
        "height": pa.array([48] * 5, pa.int32()),
        "fmt": ["bmp", "bmp", "png", "ppm", "h264"],
    })
    out = ray.data.from_arrow(tbl).map_batches(
        ImageDecodeStage, fn_constructor_args=(64, True),
        batch_format="pyarrow", batch_size=2, concurrency=2)
    rows = {r["id"]: r for r in out.take_all()}
    assert rows["h264-2"]["decode_ok"] is False
    assert "unsupported image format" in rows["h264-2"]["decode_reason"]
    # identical bytes -> identical dhash + embedding
    assert rows["bmp0"]["dhash"] == rows["bmp0-copy"]["dhash"] != 0
    np.testing.assert_array_equal(rows["bmp0"]["embedding"],
                                  rows["bmp0-copy"]["embedding"])
    # same pixels, different container (PNG) -> identical fingerprints
    assert rows["png0-copy"]["dhash"] == rows["bmp0"]["dhash"]
    np.testing.assert_array_equal(rows["png0-copy"]["embedding"],
                                  rows["bmp0"]["embedding"])
    # embedding matches the kernel directly (stage == kernel)
    want = imaging.tiny_embedding(imaging.to_gray(imgs[1]))
    np.testing.assert_allclose(rows["ppm1"]["embedding"], want, rtol=1e-6)


def test_video_stage_fake_path_plumbing():
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


def test_video_stage_real_y4m():
    """Real Y4M sampling: k uniform frame positions decode by offset; an
    MP4 payload (external codec needed) is a rejection row."""
    frames = np.stack([np.full((16, 32), (i * 13) % 256, np.uint8)
                       for i in range(10)])
    y4m = imaging.encode_y4m(frames, fps=25)
    vids = ray.data.from_arrow(pa.table({
        "id": ["y0", "bad"],
        "bytes": [y4m, b"\x00\x00\x00 ftypisom mp4 payload"],
        "fps": pa.array([25.0, 30.0], pa.float32()),
        "n_frames": pa.array([10, 50], pa.int32()),
        "fmt": ["y4m", "mp4"],
    }))
    out = vids.map_batches(VideoFrameSampleStage,
                           fn_constructor_args=(4, 64, True),
                           batch_format="pyarrow", batch_size=2,
                           concurrency=2)
    rows = {r["id"]: r for r in out.take_all()}
    assert rows["bad"]["decode_ok"] is False
    assert rows["y0"]["frame_indices"] == [0, 3, 6, 9]
    # per-frame embedding equals the kernel run on the true luma plane
    want = imaging.tiny_embedding(frames[6].astype(np.float32))
    np.testing.assert_allclose(rows["y0"]["frame_embeddings"][2], want,
                               rtol=1e-6)


def test_images_dhash_neardup_planted_recall():
    """First-class image near-dup query: exact + brightness-shift planted
    pairs MUST pair (dhash invariant under uniform shifts away from clip
    boundaries); overall planted recall gated at 0.9 (noise copies can
    exceed the Hamming radius by construction)."""
    import json

    from mail_deduplicate_ray.pipelines import images as im
    sf = "/root/testdata/sf0.001"
    path = im.images_path(sf)
    truth = json.loads((im.CACHE_ROOT / f"{path.name}.truth.json")
                       .read_text())["pairs"]
    assert truth
    got = {(r["a_id"], r["b_id"]) for r in
           im.images_dhash_neardup(sf).take_all()}
    exact = [(a, b) for a, b, k in truth if k == "exact"]
    hits_exact = sum((min(a, b), max(a, b)) in got for a, b in exact)
    assert hits_exact == len(exact)  # byte copies always pair
    hits = sum((min(a, b), max(a, b)) in got for a, b, _ in truth)
    assert hits / len(truth) >= 0.9


def test_videos_frame_neardup_planted_recall():
    """Video near-dup query: pooled tiny-image embeddings are EXACTLY
    invariant to uniform brightness shifts (mean-centered) and stable
    under frame re-timing, so all planted kinds must pair."""
    import json

    from mail_deduplicate_ray.pipelines import videos as vi
    sf = "/root/testdata/sf0.001"
    path = vi.videos_path(sf)
    truth = json.loads((vi.CACHE_ROOT / f"{path.name}.truth.json")
                       .read_text())["pairs"]
    assert truth
    got = {(r["a_id"], r["b_id"]) for r in
           vi.videos_frame_neardup(sf).take_all()}
    exact = [(a, b) for a, b, k in truth if k in ("exact", "bright")]
    hits_exact = sum((min(a, b), max(a, b)) in got for a, b in exact)
    assert hits_exact == len(exact)  # byte copies + brightness: invariant
    hits = sum((min(a, b), max(a, b)) in got for a, b, _ in truth)
    assert hits / len(truth) >= 0.9  # retimed copies within SRP radius


class TestAviMjpeg:
    def test_avi_roundtrip_and_offsets(self):
        import numpy as np
        from mail_deduplicate_ray.functions import imaging
        rng = np.random.default_rng(11)
        small = rng.integers(0, 256, (6, 6)).astype(np.float32)
        base = imaging.resize_bilinear(small, 32, 64)
        frames = np.stack([np.clip(base[:, f:f + 32], 0, 255)
                           .astype(np.uint8) for f in range(9)])
        avi = imaging.encode_avi_mjpeg(frames, quality=90)
        assert imaging.avi_frame_count(avi) == 9
        for k in (0, 4, 8):
            got = imaging.decode_avi_frame(avi, k)
            assert got.shape == (32, 32)
            err = np.abs(got.astype(int) - frames[k].astype(int)).mean()
            assert err < 6, (k, err)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            imaging.decode_avi_frame(avi, 9)
        with _pytest.raises(ValueError):
            imaging.avi_frame_offsets(b"RIFFxxxxWAVE")

    def test_container_sniffing_dispatch(self):
        import numpy as np
        from mail_deduplicate_ray.functions import imaging
        frames = np.full((3, 16, 16), 128, np.uint8)
        frames[:, 4:12, 4:12] = 200
        y4m = imaging.encode_y4m(frames)
        avi = imaging.encode_avi_mjpeg(frames)
        assert imaging.video_frame_count(y4m) == 3
        assert imaging.video_frame_count(avi) == 3
        a = imaging.decode_video_frame(avi, 1).astype(int)
        b = imaging.decode_video_frame(y4m, 1).astype(int)
        assert np.abs(a - b).mean() < 6


def test_phash_kernel_invariances():
    import numpy as np
    from mail_deduplicate_ray.functions import imaging
    rng = np.random.default_rng(41)
    img = imaging.resize_bilinear(
        rng.integers(0, 256, (8, 8)).astype(np.float32), 64, 64) \
        .astype(np.uint8)
    h = imaging.phash64(img)
    bright = np.clip(img.astype(np.int16) + 14, 0, 255).astype(np.uint8)
    noisy = np.clip(img.astype(np.int16)
                    + rng.integers(-2, 3, img.shape), 0, 255) \
        .astype(np.uint8)
    other = imaging.resize_bilinear(
        rng.integers(0, 256, (8, 8)).astype(np.float32), 64, 64) \
        .astype(np.uint8)

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(h, imaging.phash64(bright)) <= 2
    assert ham(h, imaging.phash64(noisy)) <= 2
    assert ham(h, imaging.phash64(other)) >= 10
    assert imaging.phash64(img) == h  # deterministic


def test_images_phash_neardup_planted_recall():
    import json
    from mail_deduplicate_ray.pipelines import images as im
    sf = "/root/testdata/sf0.001"
    path = im.images_path(sf)
    truth = json.loads((im.CACHE_ROOT / f"{path.name}.truth.json")
                       .read_text())["pairs"]
    assert truth
    got = {(r["a_id"], r["b_id"]) for r in
           im.images_phash_neardup(sf).take_all()}
    hits = sum((min(a, b), max(a, b)) in got for a, b, _k in truth)
    assert hits / len(truth) >= 0.9, (hits, len(truth))


def test_corpus_tiered_dedup_cross_modal():
    """Unified multimodal cascade: disjoint cover over all three
    corpora, keeper invariants, and planted-kind -> tier attribution
    per modality (audio recall across tiers mirrors clips_tiered;
    image/video kinds land in the tier their fingerprint invariance
    predicts)."""
    import json

    import pyarrow.parquet as pq

    from mail_deduplicate_ray.pipelines import clips as cl
    from mail_deduplicate_ray.pipelines import corpus as co
    from mail_deduplicate_ray.pipelines import images as im
    from mail_deduplicate_ray.pipelines import videos as vi

    sf = "/root/testdata/sf0.001"
    got = {r["asset_id"]: (r["tier"], r["keeper_id"], r["modality"])
           for r in co.corpus_tiered_dedup(sf).take_all()}

    # disjoint cover: exactly one row per asset, namespaced ids
    a_ids = {f"a:{i}" for i in pq.read_table(
        cl.clips_path(sf), columns=["clip_id"])["clip_id"].to_pylist()}
    i_ids = {f"i:{i}" for i in pq.read_table(
        im.images_path(sf), columns=["img_id"])["img_id"].to_pylist()}
    v_ids = {f"v:{i}" for i in pq.read_table(
        vi.videos_path(sf), columns=["vid_id"])["vid_id"].to_pylist()}
    assert set(got) == a_ids | i_ids | v_ids

    tiers = {"exact_bytes", "content_key", "neardup", "unique"}
    for aid, (t, k, m) in got.items():
        assert t in tiers and m == aid[0]
        if t == "unique":
            assert k == aid
        else:
            assert k < aid          # keeper = lexicographic min of group
            assert k[0] == aid[0]   # groups never cross modality here

    # audio: planted duplicate pairs caught at SOME tier (>=0.95 — the
    # clips_tiered bar; kinds map exact->1, whitespace/reencode->2,
    # nearedit/contained/stretch->3)
    a_truth = json.loads(
        (cl.CACHE_ROOT / f"{cl.clips_path(sf).name}.truth.json")
        .read_text())["recall_pairs"]
    dup_ids = {f"a:{b}" for _a, b in a_truth}
    caught = sum(got[d][0] != "unique" for d in dup_ids)
    assert caught / len(dup_ids) >= 0.95, (caught, len(dup_ids))

    # images: exact kind = same pixels, other container -> dHash equal
    # -> ALWAYS tier 2; noisy/lossy kinds may need tier 3; >=0.9 overall
    i_truth = json.loads(
        (im.CACHE_ROOT / f"{im.images_path(sf).name}.truth.json")
        .read_text())["pairs"]
    assert all(got[f"i:{b}"][0] == "content_key"
               for _a, b, k in i_truth if k == "exact")
    i_caught = sum(got[f"i:{b}"][0] != "unique" for _a, b, _k in i_truth)
    assert i_caught / len(i_truth) >= 0.9, (i_caught, len(i_truth))

    # videos: brightness shift -> mean-centered pooled SRP is invariant
    # up to 0/255 clipping, so bright copies are ALWAYS caught — usually
    # tier 2, tier 3 when clipping moved a bit, tier 1 when the drawn
    # shift was 0; exact (cross-container lossy) / retime may fall to
    # tier 3; >=0.9 overall
    v_truth = json.loads(
        (vi.CACHE_ROOT / f"{vi.videos_path(sf).name}.truth.json")
        .read_text())["pairs"]
    assert all(got[f"v:{b}"][0] != "unique"
               for _a, b, k in v_truth if k == "bright")
    v_caught = sum(got[f"v:{b}"][0] != "unique" for _a, b, _k in v_truth)
    assert v_caught / len(v_truth) >= 0.9, (v_caught, len(v_truth))
