"""Unit tests for codec + normalizer + hashing + sketch kernels
(the reference's operator-unit layer, SURVEY.md §5 / tests/test_mail.py)."""

import numpy as np
import pyarrow as pa
import pytest

from mail_deduplicate_ray import codecs
from mail_deduplicate_ray.config import DedupConfig, canonicalize_strategies
from mail_deduplicate_ray.functions import (hashing, minhash, normalize,
                                            shingles, simhash)


def _tone(sr=16000, dur_s=0.5, f=440.0):
    t = np.arange(int(sr * dur_s)) / sr
    return (0.4 * np.sin(2 * np.pi * f * t)
            + 0.2 * np.sin(2 * np.pi * 3 * f * t)).astype(np.float32)


class TestCodecs:
    @pytest.mark.parametrize("codec,min_snr", [("pcm_s16le", 60), ("ulaw", 30)])
    def test_roundtrip_snr(self, codec, min_snr):
        # per-row invariant from BASELINE.json input_hint: SNR >= 30 dB
        x = _tone()
        y, sr = codecs.decode(codecs.encode(x, 16000, codec), codec)
        assert sr == 16000 and len(y) == len(x)
        assert codecs.snr_db(x, y) >= min_snr

    def test_format_tag_wins_over_declared(self):
        # mirror of the declared-charset-then-sniff cascade (mail.py:384-407)
        x = _tone()
        y, _ = codecs.decode(codecs.encode(x, 16000, "pcm_s16le"), "ulaw")
        assert codecs.snr_db(x, y) >= 60

    def test_malformed_raises_value_error(self):
        with pytest.raises(ValueError):
            codecs.decode(b"not a wav at all")
        with pytest.raises(ValueError):
            codecs.decode(codecs.encode(_tone(), 16000, "pcm_s16le")[:20])

    def test_flac_lossless_parity_with_pcm16(self):
        # FLAC is LOSSLESS: decoded samples equal the pcm16 round-trip
        # bit-exactly (same int16 quantization), at a smaller payload
        x = _tone()
        data = codecs.encode(x, 16000, "flac")
        y, sr = codecs.decode(data, "flac")
        ref, _ = codecs.decode(codecs.encode(x, 16000, "pcm_s16le"))
        assert sr == 16000
        assert np.array_equal(y, ref)
        assert len(data) < len(x) * 2  # beats raw int16 on a tone

    def test_flac_magic_wins_over_declared(self):
        x = _tone()
        y, sr = codecs.decode(codecs.encode(x, 16000, "flac"), "ulaw")
        assert sr == 16000 and codecs.snr_db(x, y) >= 60

    def test_flac_partition_orders_agree(self):
        x = _tone()
        base, _ = codecs.decode(codecs.encode_flac(x, 16000))
        for po in (1, 3):
            y, _ = codecs.decode(codecs.encode_flac(x, 16000,
                                                    partition_order=po))
            assert np.array_equal(base, y)

    def test_flac_constant_and_empty(self):
        for sig in (np.zeros(5000, np.float32),
                    np.full(700, 0.25, np.float32),
                    np.zeros(0, np.float32)):
            y, _ = codecs.decode(codecs.encode_flac(sig, 8000))
            ref, _ = codecs.decode(codecs.encode(sig, 8000, "pcm_s16le"))
            assert np.array_equal(y, ref)

    def test_flac_corruption_rejected(self):
        data = bytearray(codecs.encode(_tone(), 16000, "flac"))
        data[300] ^= 0xFF  # inside a frame body
        with pytest.raises(ValueError):
            codecs.decode(bytes(data))
        with pytest.raises(ValueError, match="truncated"):
            codecs.decode(codecs.encode(_tone(), 16000, "flac")[:200])
        with pytest.raises(ValueError, match="not a FLAC"):
            codecs.decode(b"fLaX nope", "flac")

    def test_memoryview_input_matches_bytes(self):
        # the decode stage slices memoryviews off the Arrow buffer
        data = codecs.encode(_tone(), 16000, "pcm_s16le")
        yb, srb = codecs.decode(data)
        ym, srm = codecs.decode(memoryview(data))
        assert srb == srm and np.array_equal(yb, ym)

    def test_flac_foreign_subframes_decode(self):
        """Decoder-only paths our encoder never emits: VERBATIM and LPC
        subframes + escape-coded Rice partitions, hand-assembled with the
        module's own bit tools (≙ reading a foreign subset stream)."""
        def hand_frame(n, write_subframe):
            bw = codecs._BitWriter()
            bw.write(0b11111111111110, 14)
            bw.write(0, 2)
            bw.write(0b0111, 4)   # explicit 16-bit blocksize
            bw.write(0, 4)        # sr from STREAMINFO
            bw.write(0, 4)        # mono
            bw.write(0b100, 3)    # 16-bit
            bw.write(0, 1)
            bw.write(0, 8)        # frame number 0
            bw.write(n - 1, 16)
            hdr = bw.getvalue()
            hdr += bytes([codecs._crc8(hdr)])
            body = codecs._BitWriter()
            write_subframe(body)
            body.align()
            fr = hdr + body.getvalue()
            return fr + codecs._crc16(fr).to_bytes(2, "big")

        def container(frame, n, sr=8000):
            si = codecs._BitWriter()
            si.write(codecs._FLAC_BLOCK, 16)
            si.write(codecs._FLAC_BLOCK, 16)
            si.write(0, 48)
            si.write(sr, 20)
            si.write(0, 3)
            si.write(15, 5)
            si.write(n, 36)
            si.align()
            return (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
                    + si.getvalue() + bytes(16) + frame)

        rng = np.random.default_rng(7)
        want = rng.integers(-3000, 3000, 64).astype(np.int64)

        def verbatim(body):
            body.write(0, 1)
            body.write(1, 6)      # verbatim
            body.write(0, 1)
            for s in want.tolist():
                body.write(int(s) & 0xFFFF, 16)

        y, sr = codecs.decode(container(hand_frame(64, verbatim), 64))
        assert sr == 8000
        assert np.array_equal(y, want.astype(np.float32) / 32767.0)

        def lpc_order1(body):
            # coef [2], shift 1 -> pred = s[i-1]; residual = diff
            body.write(0, 1)
            body.write(0b100000, 6)   # LPC order 1
            body.write(0, 1)
            body.write(int(want[0]) & 0xFFFF, 16)   # warmup
            body.write(14, 4)         # coef precision 15 bits (-1 coded)
            body.write(1, 5)          # shift
            body.write(2, 15)         # coefficient
            body.write(0, 2)          # rice method 0
            body.write(0, 4)          # partition order 0
            res = np.diff(want)
            zig = (res << 1) ^ (res >> 63)
            k = 6
            body.write(k, 4)
            for z in zig.tolist():
                body.write(0, z >> k)
                body.write(1, 1)
                body.write(z & ((1 << k) - 1), k)

        y2, _ = codecs.decode(container(hand_frame(64, lpc_order1), 64))
        assert np.array_equal(y2, want.astype(np.float32) / 32767.0)

        def escaped_fixed0(body):
            body.write(0, 1)
            body.write(0b001000, 6)   # fixed order 0
            body.write(0, 1)
            body.write(0, 2)
            body.write(0, 4)
            body.write(15, 4)         # ESCAPE code
            body.write(13, 5)         # 13-bit raw residuals
            for s in want.tolist():
                body.write(int(s) & 0x1FFF, 13)

        y3, _ = codecs.decode(container(hand_frame(64, escaped_fixed0), 64))
        assert np.array_equal(y3, want.astype(np.float32) / 32767.0)

    @pytest.mark.parametrize("codec", ["pcm_s16le", "ulaw", "flac"])
    def test_max_samples_prefix(self, codec):
        x = _tone()
        data = codecs.encode(x, 16000, codec)
        full, _ = codecs.decode(data, codec)
        pre, _ = codecs.decode(data, codec, max_samples=100)
        assert len(pre) == 100 and np.array_equal(pre, full[:100])
        # asking for more than the clip holds returns the whole clip
        over, _ = codecs.decode(data, codec, max_samples=10 * len(x))
        assert np.array_equal(over, full)


class TestDecodeStageZeroCopy:
    """The decode stage reads payloads as Arrow-buffer memoryview slices;
    null rows, sliced batches and chunked columns must all behave."""

    def _table(self, payloads, codecs_col=None):
        n = len(payloads)
        return pa.table({
            "clip_id": pa.array([f"c{i}" for i in range(n)]),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array([16000] * n, pa.int32()),
            "dur_ms": pa.array([500] * n, pa.int32()),
            "codec": pa.array(codecs_col or ["pcm_s16le"] * n),
            "transcript": pa.array(["t"] * n),
        })

    def test_null_payload_is_rejected_not_crash(self):
        from mail_deduplicate_ray.stages.decode import DecodeStage
        good = codecs.encode(_tone(), 16000, "pcm_s16le")
        out = DecodeStage(DedupConfig())(self._table([good, None, good]))
        assert out["decode_ok"].to_pylist() == [True, False, True]
        assert out["decode_reason"].to_pylist()[1] == "decode_failed"
        fps = out["audio_fp"].to_pylist()
        assert fps[0] == fps[2] != 0

    def test_sliced_and_chunked_batches_match_whole(self):
        from mail_deduplicate_ray.stages.decode import DecodeStage
        payloads = [codecs.encode(_tone(f=200.0 + 50 * i), 16000, "pcm_s16le")
                    for i in range(6)]
        tbl = self._table(payloads)
        stage = DecodeStage(DedupConfig())
        whole = stage(tbl)["audio_fp"].to_pylist()
        sliced = stage(tbl.slice(2, 3))["audio_fp"].to_pylist()
        assert sliced == whole[2:5]
        chunked = pa.concat_tables([tbl.slice(0, 2), tbl.slice(2)])
        assert stage(chunked)["audio_fp"].to_pylist() == whole


class TestNormalize:
    def test_strip_leading_markers(self):
        # same regex family as normalize_subject (mail.py:539-546)
        arr = pa.array(["Re: hello world", "RE: re: fwd: x", "[list] body",
                        "um uh hello", "plain"])
        out = normalize.strip_leading_markers(arr).to_pylist()
        assert out == ["hello world", "x", "body", "hello", "plain"]

    def test_collapse_and_squash(self):
        arr = pa.array(["a  b\t c\r\nd"])
        assert normalize.collapse_whitespace(arr).to_pylist() == ["a b c d"]
        assert normalize.squash_whitespace(arr).to_pylist() == ["abcd"]

    def test_normalize_codec(self):
        # keep only the type, drop params (mail.py:548-565)
        arr = pa.array(["audio/WAV; rate=16000", " ulaw ;x", "pcm_s16le"])
        assert normalize.normalize_codec(arr).to_pylist() == \
            ["audio/wav", "ulaw", "pcm_s16le"]

    def test_crlf_lf_equal_after_normalize(self):
        # CRLF vs LF bodies are duplicates (tests/test_mail_integration.py:334)
        a = pa.array(["line one\r\nline two", "line one\nline two"])
        out = normalize.normalize_transcript(a).to_pylist()
        assert out[0] == out[1]


class TestExactKey:
    CFG = DedupConfig()

    def _batch(self, **over):
        base = {
            "sr_hz": [16000], "codec_norm": ["pcm_s16le"], "dur_bucket": [10],
            "transcript": ["hello world"],
        }
        base.update(over)
        return pa.table(base)

    def test_transcript_modes(self):
        t = self._batch()
        raw = hashing.add_exact_key(t, DedupConfig(transcript_hash="raw"))
        skip = hashing.add_exact_key(t, DedupConfig(transcript_hash="skip"))
        norm = hashing.add_exact_key(t, DedupConfig(transcript_hash="normalized"))
        k = lambda x: x["exact_key"][0].as_py()  # noqa: E731
        assert k(raw) != k(skip) != k(norm)
        # whitespace-perturbed transcript: same normalized key, diff raw key
        t2 = self._batch(transcript=["  hello \n world "])
        raw2 = hashing.add_exact_key(t2, DedupConfig(transcript_hash="raw"))
        norm2 = hashing.add_exact_key(t2, DedupConfig(transcript_hash="normalized"))
        assert k(norm2) == k(norm)
        assert k(raw2) != k(raw)

    def test_audio_fp_component_splits_metadata_twins(self):
        """key_audio_fp (round 5): two byte-DIFFERENT clips with empty
        transcripts and equal (sr, codec, dur_bucket) must NOT share an
        exact key — metadata+text-only keys collapsed all such clips
        into one mega-cluster (measured 168k members at the 783k scale
        point).  Identical audio still collides; the flag restores the
        old behavior."""
        t = pa.table({
            "sr_hz": [8000, 8000, 8000],
            "codec_norm": ["ulaw"] * 3,
            "dur_bucket": [15, 15, 15],
            "transcript": ["", "", ""],
            "audio_fp": pa.array([0xAB12, 0xCD34, 0xAB12], pa.uint64()),
        })
        out = hashing.add_exact_key(t, DedupConfig())
        k = out["exact_key"].to_pylist()
        assert k[0] != k[1]          # different audio -> different key
        assert k[0] == k[2]          # same audio -> same key
        assert k[0].endswith(f"{0xAB12:016x}")
        legacy = hashing.add_exact_key(t, DedupConfig(key_audio_fp=False))
        lk = legacy["exact_key"].to_pylist()
        assert lk[0] == lk[1] == lk[2]
        # batches without the column (text-only callers) are unaffected
        t2 = self._batch()
        plain = hashing.add_exact_key(t2, DedupConfig())
        assert len(plain["exact_key"][0].as_py()) == 112

    def test_minimal_fields_rejection(self):
        # ref: TooFewHeaders (mail.py:480-504, cli.py:97-104)
        t = pa.table({"sr_hz": pa.array([None], pa.int32()),
                      "codec_norm": [""],
                      "dur_bucket": pa.array([None], pa.int64()),
                      "transcript": ["x"]})
        out = hashing.add_exact_key(t, DedupConfig(minimal_fields=2))
        assert out["rejected"][0].as_py() is True
        assert out["reject_reason"][0].as_py() == "too_few_fields"
        assert out["exact_key"][0].as_py() is None


class TestMinHash:
    def test_jaccard_estimate_accuracy(self):
        mh = minhash.MinHasher(128, 1, 16)
        t1 = "the quick brown fox jumps over the lazy dog " * 4
        t2 = t1.replace("dog", "cat")
        flat, offs = shingles.batch_shingles([t1, t2], 5)
        sig = mh.signatures(flat, offs)
        s1 = set(shingles.shingle_hashes(t1, 5).tolist())
        s2 = set(shingles.shingle_hashes(t2, 5).tolist())
        true_j = len(s1 & s2) / len(s1 | s2)
        assert abs(minhash.est_jaccard(sig[0], sig[1]) - true_j) < 0.12

    def test_identical_docs_full_band_collision(self):
        mh = minhash.MinHasher(128, 1, 16)
        flat, offs = shingles.batch_shingles(["same text here"] * 2, 5)
        keys = mh.band_keys(mh.signatures(flat, offs))
        assert (keys[0] == keys[1]).all()

    def test_empty_doc_never_collides(self):
        mh = minhash.MinHasher(128, 1, 16)
        flat, offs = shingles.batch_shingles(["", "real text longer"], 5)
        sig = mh.signatures(flat, offs)
        assert (sig[0] == np.iinfo(np.uint64).max).all()

    def test_containment_estimate(self):
        mh = minhash.MinHasher(128, 1, 16)
        big = "alpha bravo charlie delta echo foxtrot golf hotel " * 6
        small = big[40:200]
        flat, offs = shingles.batch_shingles([big, small], 5)
        anchors, sk, sz = mh.anchors_and_sketch(flat, offs)
        assert len(np.intersect1d(anchors[0], anchors[1])) > 0
        c = minhash.est_containment(sk[0], sz[0], sk[1], sz[1], 64)
        assert c >= 0.9
        # disjoint docs -> containment ~0
        flat2, offs2 = shingles.batch_shingles(
            [big, "zulu yankee xray whiskey victor uniform " * 6], 5)
        _, sk2, sz2 = mh.anchors_and_sketch(flat2, offs2)
        assert minhash.est_containment(sk2[0], sz2[0], sk2[1], sz2[1], 64) < 0.3


class TestSimHash:
    def test_reencode_within_hamming(self):
        x = _tone()
        srp = simhash.SRP(48, 64, 7)
        y, _ = codecs.decode(codecs.encode(x, 16000, "ulaw"))
        f = np.stack([simhash.spectral_features(x, 16000, 48),
                      simhash.spectral_features(y, 16000, 48)])
        fp = srp.fingerprint(f)
        assert simhash.hamming(fp[:1], fp[1:])[0] <= 3

    def test_different_audio_far(self):
        srp = simhash.SRP(48, 64, 7)
        f = np.stack([simhash.spectral_features(_tone(f=440), 16000, 48),
                      simhash.spectral_features(_tone(f=1230), 16000, 48)])
        fp = srp.fingerprint(f)
        assert simhash.hamming(fp[:1], fp[1:])[0] > 10

    def test_band_keys_guarantee(self):
        # hamming d < bands -> at least one band equal (pigeonhole)
        a = np.uint64(0xDEADBEEFCAFEF00D)
        b = a ^ np.uint64(1 << 3) ^ np.uint64(1 << 40) ^ np.uint64(1 << 63)
        ka = simhash.band_keys_u64(np.array([a]), 4)
        kb = simhash.band_keys_u64(np.array([b]), 4)
        assert (ka == kb).sum() >= 1


class TestConfig:
    def test_alias_resolution_dedups(self):
        # ref: cli.py:155-166 unique_strategies incl. aliases
        out = canonicalize_strategies(
            ["discard-older", "select-newest", "select-one"])
        assert out == ("select-newest", "select-one")

    def test_fingerprint_sensitivity(self):
        a, b = DedupConfig(), DedupConfig(shingle_k=7)
        c = DedupConfig(size_threshold=9999)  # not signature-affecting
        assert a.fingerprint() != b.fingerprint()
        assert a.fingerprint() == c.fingerprint()

    def test_unknown_strategy_rejected(self):
        with pytest.raises(ValueError):
            DedupConfig(strategies=("select-best",))


class TestTomlConfig:
    def test_from_toml_strict_keys(self, tmp_path):
        # ref: cli.py:299-318 strict config-file keys
        p = tmp_path / "cfg.toml"
        p.write_text('[dedup]\nshingle_k = 6\n'
                     'strategies = ["discard-older", "select-one"]\n')
        cfg = DedupConfig.from_toml(str(p))
        assert cfg.shingle_k == 6
        assert cfg.strategies == ("select-newest", "select-one")
        # override wins
        cfg2 = DedupConfig.from_toml(str(p), shingle_k=9)
        assert cfg2.shingle_k == 9
        bad = tmp_path / "bad.toml"
        bad.write_text("[dedup]\nnot_a_key = 1\n")
        with pytest.raises(ValueError, match="unknown config keys"):
            DedupConfig.from_toml(str(bad))


class TestSuffixArray:
    def test_suffix_array_matches_sorted_suffixes(self):
        from mail_deduplicate_ray.functions.suffixarray import suffix_array
        rng = np.random.default_rng(7)
        for n in (0, 1, 2, 37, 256):
            data = rng.integers(97, 101, size=n).astype(np.uint8)
            sa = suffix_array(data)
            b = data.tobytes()
            expect = sorted(range(n), key=lambda i: b[i:])
            assert sa.tolist() == expect

    def test_sa_contains(self):
        from mail_deduplicate_ray.functions.suffixarray import (sa_contains,
                                                                suffix_array)
        text = b"the quick brown fox jumps over the lazy dog"
        sa = suffix_array(np.frombuffer(text, np.uint8))
        assert sa_contains(text, sa, b"quick brown")
        assert sa_contains(text, sa, b"the lazy dog")
        assert sa_contains(text, sa, b"")
        assert not sa_contains(text, sa, b"quick browns")
        assert not sa_contains(text, sa, b"zzz")

    def test_minimizer_containment_guarantee(self):
        # if P (len >= w+k-1) occurs in T, minimizers intersect
        from mail_deduplicate_ray.functions.shingles import minimizers
        rng = np.random.default_rng(3)
        k, w = 16, 49  # min_len = w + k - 1 = 64
        text = rng.integers(97, 123, size=5000).astype(np.uint8)
        for start, plen in ((0, 64), (123, 64), (1000, 400), (4936, 64)):
            pat = text[start:start + plen]
            mp = minimizers(pat, k, w)
            mt = minimizers(text, k, w)
            assert len(mp) > 0
            assert len(np.intersect1d(mp, mt)) > 0
        # too-short pattern yields empty set
        assert len(minimizers(text[:63], k, w)) == 0


class TestAdpcm:
    """IMA-ADPCM (WAV tag 0x11) — the registry's third real codec and its
    worked extension example (≙ EML proving the reference's box-format
    registry, mail_box.py:128-232)."""

    def test_roundtrip_snr_tone(self):
        x = _tone()
        data = codecs.encode(x, 16000, "adpcm_ima")
        y, sr = codecs.decode(data)  # tag sniffed, no declared codec
        assert sr == 16000
        # output is block-rounded (final block zero-padded)
        assert len(x) <= len(y) < len(x) + 505
        assert codecs.snr_db(x, y) >= 30
        # ~4.1 bits/sample incl. headers vs 16 for pcm
        assert len(data) < 0.6 * len(x)

    def test_roundtrip_snr_speechlike(self):
        rng = np.random.default_rng(3)
        n = rng.standard_normal(8000)
        k = np.exp(-np.arange(40) / 8.0)
        sp = np.convolve(n, k)[:8000]
        sp = (0.3 * sp / np.abs(sp).max()).astype(np.float32)
        y, _ = codecs.decode(codecs.encode(sp, 8000, "adpcm_ima"))
        assert codecs.snr_db(sp, y) >= 20  # 4-bit ADPCM on broadband

    def test_max_samples_whole_blocks(self):
        x = _tone()
        data = codecs.encode(x, 16000, "adpcm_ima")
        full, _ = codecs.decode(data)
        pre, _ = codecs.decode(data, max_samples=100)
        # block granularity: rounded up to one 505-sample block
        assert len(pre) == 505
        assert np.array_equal(pre, full[:505])

    def test_truncated_payload_rejected(self):
        data = codecs.encode(_tone(), 16000, "adpcm_ima")
        hdr = 44  # RIFF header size
        with pytest.raises(ValueError, match="truncated"):
            # mid-block cut: container dlen no longer matches
            codecs.decode(data[:hdr + 100])

    def test_corrupt_block_header_rejected(self):
        data = bytearray(codecs.encode(_tone(), 16000, "adpcm_ima"))
        data[44 + 2] = 200  # step index way out of range
        with pytest.raises(ValueError, match="corrupt"):
            codecs.decode(bytes(data))

    def test_empty_signal(self):
        y, sr = codecs.decode(codecs.encode(
            np.empty(0, np.float32), 8000, "adpcm_ima"))
        assert sr == 8000 and len(y) == 0


def test_bloom_sketch_properties():
    import numpy as np
    import pandas as pd

    from mail_deduplicate_ray.functions import sketch
    rng = np.random.default_rng(3)
    keys = pd.util.hash_array(
        np.asarray([f"key-{i}" for i in range(50_000)], dtype=object))
    other = pd.util.hash_array(
        np.asarray([f"other-{i}" for i in range(50_000)], dtype=object))
    # merge of two halves == partial of the union
    half = sketch.bloom_partial(keys[:25_000])
    full = sketch.bloom_merge(half, sketch.bloom_partial(keys[25_000:]))
    assert np.array_equal(full, sketch.bloom_partial(keys))
    # no false negatives
    assert sketch.bloom_contains(full, keys).all()
    # FP rate on disjoint keys near the analytic estimate
    fp = sketch.bloom_contains(full, other).mean()
    est = sketch.bloom_fp_rate(full)
    assert fp <= 2 * est + 1e-4 and fp < 0.02, (fp, est)
    # empty filter rejects everything
    empty = sketch.bloom_partial(np.empty(0, np.uint64))
    assert not sketch.bloom_contains(empty, keys).any()


class TestCDC:
    def test_boundaries_respect_bounds_and_cover(self):
        import numpy as np
        from mail_deduplicate_ray.functions import cdc
        rng = np.random.default_rng(5)
        data = rng.integers(0, 256, 150_000, dtype=np.uint8).tobytes()
        ends = cdc.chunk_boundaries(data)
        lens = np.diff(np.concatenate(([0], ends)))
        assert ends[-1] == len(data)
        assert (lens[:-1] >= cdc.MIN_SIZE).all()
        assert (lens <= cdc.MAX_SIZE).all()
        # average lands near the target (normalized chunking)
        assert cdc.AVG_SIZE / 2 < lens.mean() < cdc.AVG_SIZE * 2

    def test_determinism_and_identity(self):
        import numpy as np
        from mail_deduplicate_ray.functions import cdc
        rng = np.random.default_rng(6)
        data = rng.integers(0, 256, 60_000, dtype=np.uint8).tobytes()
        l1, d1 = cdc.chunk_payload(data)
        l2, d2 = cdc.chunk_payload(data)
        assert np.array_equal(l1, l2) and d1 == d2
        # chunk lengths reconstruct the payload
        assert int(l1.sum()) == len(data)

    def test_shift_resistance(self):
        # content-defined: a 7-byte prepend must preserve most chunks
        import numpy as np
        from mail_deduplicate_ray.functions import cdc
        rng = np.random.default_rng(7)
        data = rng.integers(0, 256, 120_000, dtype=np.uint8).tobytes()
        _, d1 = cdc.chunk_payload(data)
        _, d2 = cdc.chunk_payload(b"\x07\x06\x05\x04\x03\x02\x01" + data)
        shared = len(set(d1) & set(d2)) / len(set(d1))
        assert shared >= 0.5, shared

    def test_windowed_hash_matches_streaming(self):
        # gear hash at position i must equal the 64-byte streaming hash
        import numpy as np
        from mail_deduplicate_ray.functions import cdc
        rng = np.random.default_rng(8)
        arr = rng.integers(0, 256, 300, dtype=np.uint8)
        h = cdc.gear_hashes(arr)
        ref = np.uint64(0)
        for i, b in enumerate(arr):
            ref = (ref << np.uint64(1)) + cdc.GEAR[b]
            if i >= 64:
                # windowed hash keeps only the last 64 terms
                win = np.uint64(0)
                for j in range(64):
                    win = (win << np.uint64(1)) + cdc.GEAR[arr[i - 63 + j]]
                assert h[i] == win

    def test_min_size_guard(self):
        import pytest as _pytest
        from mail_deduplicate_ray.functions import cdc
        with _pytest.raises(ValueError):
            cdc.chunk_boundaries(b"x" * 1000, min_size=32)

    def test_tiny_and_empty_payloads(self):
        import numpy as np
        from mail_deduplicate_ray.functions import cdc
        assert len(cdc.chunk_boundaries(b"")) == 0
        ends = cdc.chunk_boundaries(b"abc")
        assert list(ends) == [3]


class TestQuantileSummary:
    def test_error_bound_vs_exact(self):
        import numpy as np
        from mail_deduplicate_ray.functions import sketch
        rng = np.random.default_rng(51)
        data = rng.lognormal(size=50_000)
        blocks = np.array_split(data, 37)
        summary = sketch.qs_merge([sketch.qs_partial(b) for b in blocks])
        srt = np.sort(data)
        n = len(data)
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            est = sketch.qs_quantile(summary, q)
            # rank of the estimate in the true data
            r = np.searchsorted(srt, est)
            bound = n / (2 * sketch.QS_GRID) * 1.0 + len(blocks)
            assert abs(r - q * n) <= bound, (q, r, q * n, bound)

    def test_merge_order_independence(self):
        import numpy as np
        from mail_deduplicate_ray.functions import sketch
        rng = np.random.default_rng(52)
        blocks = [rng.normal(size=rng.integers(10, 3000))
                  for _ in range(11)]
        parts = [sketch.qs_partial(b) for b in blocks]
        a = sketch.qs_merge(parts)
        b = sketch.qs_merge(parts[::-1])
        for q in (0.1, 0.5, 0.9):
            assert sketch.qs_quantile(a, q) == sketch.qs_quantile(b, q)

    def test_small_block_is_exact(self):
        import numpy as np
        from mail_deduplicate_ray.functions import sketch
        v = np.array([5.0, 1.0, 3.0])
        s = sketch.qs_partial(v)
        assert sketch.qs_quantile(s, 0.0) == 1.0
        assert sketch.qs_quantile(s, 1.0) == 5.0
        assert sketch.qs_quantile(s, 0.5) == 3.0
        assert len(sketch.qs_partial(np.empty(0))) == 0
        import math
        assert math.isnan(sketch.qs_quantile(
            np.empty((0, 2)), 0.5))


class TestStretchMatch:
    """functions/stretchmatch.py: the stretch channel's peak kernel.

    A resample by factor f scales every component frequency by 1/f, so
    peak log-frequencies shift by exactly -ln f and amplitude ratios are
    preserved — keys (log-freq DIFFERENCES) are invariant, and the
    global-shift consensus verify scores ~1 for true copies."""

    def _peaks(self, pcm, sr):
        import numpy as np
        from mail_deduplicate_ray.functions import simhash, stretchmatch
        W = simhash._FFT_WINDOW
        buf = np.zeros(W)
        w = min(len(pcm), W)
        buf[:w] = pcm[:w]
        mag = np.abs(np.fft.rfft(buf * stretchmatch._hann(W)))
        return stretchmatch.peak_table(mag, sr, W, 6, 0.05)

    def _tone(self, freqs, amps, sr=8000, dur_s=1.0, seed=3):
        import numpy as np
        rng = np.random.default_rng(seed)
        t = np.arange(int(sr * dur_s)) / sr
        x = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
        return (x + rng.normal(0, 0.005, len(t))).astype(np.float32)

    def test_peak_table_batch_bit_parity(self):
        """peak_table_batch must equal row-by-row peak_table BITWISE —
        same subset argsort, same refinement ops (the decode stage's
        vectorized path, VERDICT r4 item 10)."""
        import numpy as np
        from mail_deduplicate_ray.functions import simhash, stretchmatch
        W = simhash._FFT_WINDOW
        sr, P, floor = 8000, 6, 0.05
        rng = np.random.default_rng(41)
        mats = []
        for s in range(12):
            freqs = rng.uniform(80, 3500, rng.integers(1, 7))
            amps = rng.uniform(0.1, 1.0, len(freqs))
            pcm = self._tone(freqs, amps, sr=sr, seed=s)
            buf = np.zeros(W)
            w = min(len(pcm), W)
            buf[:w] = pcm[:w]
            mats.append(np.abs(np.fft.rfft(buf * stretchmatch._hann(W))))
        mats.append(np.zeros(W // 2 + 1))      # silent row: zero peaks
        mags = np.stack(mats)
        lf_b, a_b, k_b = stretchmatch.peak_table_batch(
            mags, sr, W, P, floor)
        for r in range(mags.shape[0]):
            lf, a = stretchmatch.peak_table(mags[r], sr, W, P, floor)
            assert k_b[r] == len(lf)
            np.testing.assert_array_equal(lf_b[r, :len(lf)], lf)
            np.testing.assert_array_equal(a_b[r, :len(a)], a)
            assert not lf_b[r, len(lf):].any()

    def test_peak_logf_shifts_by_ln_f_under_resample(self):
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp
        sr = 8000
        pcm = self._tone([220.0, 733.0, 1531.0], [0.3, 0.2, 0.15], sr)
        f = 1.19
        pcm2 = audio_dsp.resample_linear(pcm, sr, int(sr * f))
        la, aa = self._peaks(pcm, sr)
        lb, ab = self._peaks(pcm2, sr)
        assert len(la) == len(lb) == 3
        # same amp ordering, log-freqs shifted by exactly ln f
        shift = la - lb
        assert np.allclose(shift, np.log(f), atol=0.004)
        assert np.allclose(np.sort(aa), np.sort(ab), atol=0.15)

    def test_bucket_keys_invariant_and_verify_separates(self):
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp, stretchmatch
        sr = 8000
        pcm = self._tone([190.0, 412.0, 997.0, 2203.0],
                         [0.3, 0.25, 0.2, 0.1], sr)
        pcm2 = audio_dsp.resample_linear(pcm, sr, int(sr * 1.27))
        pcm2 = np.concatenate([np.zeros(640, np.float32), pcm2])  # 80ms pad
        other = self._tone([251.0, 648.0, 1444.0], [0.3, 0.2, 0.2], sr,
                           seed=9)
        pa_, aa = self._peaks(pcm, sr)
        pb_, ab = self._peaks(pcm2, sr)
        po_, ao = self._peaks(other, sr)
        ka = stretchmatch.bucket_keys(pa_, aa, 0.02)
        kb = stretchmatch.bucket_keys(pb_, ab, 0.02)
        ko = stretchmatch.bucket_keys(po_, ao, 0.02)
        assert len(set(ka) & set(kb)) > 0          # stretched copy collides
        sc, nm = stretchmatch.verify_pair(pa_, aa, pb_, ab, 0.004, 0.59)
        assert sc >= 0.8 and nm >= 3, (sc, nm)
        so, _ = stretchmatch.verify_pair(pa_, aa, po_, ao, 0.004, 0.59)
        assert so < 0.8, so

    def test_score_pairs_matches_score_matrix(self):
        # score_pairs is the pair-list form of score_matrix (the stretch
        # core verifies each distinct pair once instead of per-bucket
        # m x m); per direction its (score, matched) must agree with the
        # corresponding matrix cell to float32 rounding, and the
        # symmetrized accept rule must agree EXACTLY at thresholds away
        # from the rounding scale
        import numpy as np
        from mail_deduplicate_ray.functions import stretchmatch
        rng = np.random.default_rng(17)
        m, P = 14, 6
        # synthetic peak tables in [ln 50, ln 4000], amp-descending,
        # variable peak counts (zero-padded), a few exact shifted copies
        L = np.zeros((m, P))
        A = np.zeros((m, P))
        for i in range(m):
            k = rng.integers(2, P + 1)
            L[i, :k] = np.sort(rng.uniform(np.log(50), np.log(4000), k))[::-1]
            A[i, :k] = np.sort(rng.uniform(0.05, 1.0, k))[::-1]
            A[i, 0] = 1.0
        for src, dst in ((0, 1), (2, 3)):   # plant true stretched copies
            k = int((A[src] > 0).sum())
            L[dst], A[dst] = 0.0, 0.0
            L[dst, :k] = L[src, :k] + rng.uniform(-0.3, 0.3)
            A[dst, :k] = A[src, :k]
        tol, max_shift = 0.004, 0.59
        sc_m, nm_m = stretchmatch.score_matrix(L, A, tol, max_shift)
        iu, ju = np.triu_indices(m, 1)
        sc_p, nm_p = stretchmatch.score_pairs(
            L[iu], A[iu], L[ju], A[ju], tol, max_shift, chunk=7)
        for d, (r, c) in enumerate(((iu, ju), (ju, iu))):
            assert np.allclose(sc_p[:, d], sc_m[r, c], atol=1e-5), d
            assert (nm_p[:, d] == nm_m[r, c]).all(), d
        smin = 0.8
        acc_matrix = (sc_m >= smin) & (nm_m >= 2)
        acc_matrix |= acc_matrix.T
        acc_pairs = ((sc_p >= smin) & (nm_p >= 2)).any(axis=1)
        assert (acc_pairs == acc_matrix[iu, ju]).all()
        assert acc_pairs.sum() >= 2   # the planted copies pass

    def test_pair_key_covers_peak_count_mismatch(self):
        # a copy that gains a weak 4th peak still shares the top-2 pair key
        import numpy as np
        from mail_deduplicate_ray.functions import stretchmatch
        la = np.log([200.0, 900.0])
        lb = np.log([200.0, 900.0, 2100.0])
        ka = stretchmatch.bucket_keys(la, np.array([1.0, 0.8]), 0.02)
        kb = stretchmatch.bucket_keys(lb, np.array([1.0, 0.8, 0.1]), 0.02)
        assert len(set(ka) & set(kb)) > 0
