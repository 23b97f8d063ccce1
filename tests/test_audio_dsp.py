"""Audio DSP kernels (functions/audio_dsp.py) + the AudioStatsStage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mail_deduplicate_ray import codecs
from mail_deduplicate_ray.functions import audio_dsp
from mail_deduplicate_ray.stages.audio_stats import AudioStatsStage


def _sine(freq=440.0, sr=16000, dur=0.5, amp=1.0):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestKernels:
    def test_rms_full_scale_sine(self):
        # RMS of a full-scale sine is 1/sqrt(2) = -3.0103 dBFS
        assert audio_dsp.rms_dbfs(_sine()) == pytest.approx(-3.0103, abs=0.02)

    def test_rms_scales_with_amplitude(self):
        # halving amplitude drops RMS by exactly 6.02 dB
        d = (audio_dsp.rms_dbfs(_sine(amp=1.0))
             - audio_dsp.rms_dbfs(_sine(amp=0.5)))
        assert d == pytest.approx(6.0206, abs=0.01)

    def test_peak_and_empty(self):
        assert audio_dsp.peak_dbfs(_sine(amp=0.5)) == pytest.approx(
            -6.0206, abs=0.01)
        assert audio_dsp.rms_dbfs(np.array([], np.float32)) == -240.0
        assert audio_dsp.peak_dbfs(np.zeros(10, np.float32)) == -240.0

    def test_zero_crossings_counts_transitions(self):
        # f Hz over d seconds crosses zero ~2*f*d times
        zc = audio_dsp.zero_crossings(_sine(freq=100, sr=16000, dur=1.0))
        assert abs(zc - 200) <= 1
        assert audio_dsp.zero_crossings(np.ones(100, np.float32)) == 0

    def test_resample_preserves_band_limited_signal(self):
        # 300 Hz tone, 16 kHz -> 8 kHz: linear interp keeps >=30 dB SNR
        x = _sine(freq=300, sr=16000, dur=0.25)
        y = audio_dsp.resample_linear(x, 16000, 8000)
        ref = _sine(freq=300, sr=8000, dur=0.25)
        n = min(len(y), len(ref))
        err = y[:n] - ref[:n]
        snr = 10 * np.log10(np.mean(ref[:n] ** 2) / np.mean(err ** 2))
        assert snr >= 30.0
        assert len(y) == pytest.approx(len(x) / 2, abs=2)

    def test_resample_identity_and_validation(self):
        x = _sine()
        assert audio_dsp.resample_linear(x, 16000, 16000) is x
        with pytest.raises(ValueError):
            audio_dsp.resample_linear(x, 0, 8000)

    def test_trim_silence_bounds(self):
        sr = 16000
        pad = np.zeros(sr // 4, np.float32)
        x = np.concatenate([pad, _sine(sr=sr, dur=0.25), pad])
        lo, hi = audio_dsp.trim_silence(x, threshold_dbfs=-40.0)
        assert abs(lo - len(pad)) <= 256
        assert abs(hi - (len(pad) + sr // 4)) <= 256
        assert audio_dsp.trim_silence(np.zeros(4096, np.float32)) == (0, 0)


class TestAudioStatsStage:
    def _batch(self, pcms, srs, codec="pcm_s16le"):
        payloads = [codecs.encode(p, sr, codec) for p, sr in zip(pcms, srs)]
        return pa.table({
            "clip_id": [f"c{i}" for i in range(len(pcms))],
            "bytes": pa.array(payloads, pa.binary()),
            "codec": [codec] * len(pcms)})

    def test_stage_stats_match_kernels(self):
        x = _sine(amp=0.5)
        out = AudioStatsStage()(self._batch([x], [16000]))
        row = out.to_pylist()[0]
        assert row["audio_ok"]
        assert row["n_samples"] == len(x)
        # encode/decode quantizes to int16: allow 10 milli-dB
        assert abs(row["rms_mdb"] - round(
            audio_dsp.rms_dbfs(x) * 1000)) <= 10
        assert abs(row["zero_crossings"]
                   - audio_dsp.zero_crossings(x)) <= 2
        assert row["active_samples"] >= len(x) - 512
        assert "bytes" not in out.column_names

    def test_stage_malformed_payload_flagged_not_raised(self):
        t = pa.table({"clip_id": ["a", "b"],
                      "bytes": pa.array([b"notawav", None], pa.binary()),
                      "codec": ["pcm_s16le", "pcm_s16le"]})
        out = AudioStatsStage()(t).to_pylist()
        assert [r["audio_ok"] for r in out] == [False, False]
        assert [r["rms_mdb"] for r in out] == [-240_000, -240_000]


def test_spectral_centroid_tracks_tone_frequency():
    from mail_deduplicate_ray.functions import audio_dsp as dsp
    for f in (300.0, 1200.0):
        c = dsp.spectral_centroid_hz(_sine(freq=f, sr=16000, dur=0.5),
                                     16000)
        assert abs(c - f) < f * 0.15 + 20
    # brighter content -> higher centroid (ordering property)
    lo = dsp.spectral_centroid_hz(_sine(freq=200, sr=16000), 16000)
    hi = dsp.spectral_centroid_hz(_sine(freq=3000, sr=16000), 16000)
    assert hi > lo
    assert dsp.spectral_centroid_hz(np.zeros(1000, np.float32), 16000) == 0.0


def test_snr_estimate_orders_dynamics():
    from mail_deduplicate_ray.functions import audio_dsp as dsp
    sr = 16000
    tone = _sine(sr=sr, dur=0.5)
    # half silence + half tone has a much higher mean/floor ratio than
    # a continuous tone
    bursty = np.concatenate([np.zeros(len(tone), np.float32)
                             + 1e-4, tone])
    assert dsp.snr_estimate_db(bursty) > dsp.snr_estimate_db(tone) + 10
    assert dsp.snr_estimate_db(np.zeros(100, np.float32)) == 0.0


class TestSegmentation:
    def _speech_like(self, sr=16000):
        # tone(0.1s) silence(0.05s) tone(0.1s) longsilence(0.3s) tone(0.1s)
        tone = _sine(freq=440, sr=sr, dur=0.1, amp=0.5)
        gap_short = np.zeros(int(sr * 0.05), np.float32)
        gap_long = np.zeros(int(sr * 0.3), np.float32)
        pcm = np.concatenate([tone, gap_short, tone, gap_long, tone])
        return pcm, sr, tone, gap_short, gap_long

    def test_segment_silence_splits_on_long_gaps_only(self):
        pcm, sr, tone, gs, gl = self._speech_like()
        # frame=256 @16k = 16ms; 0.05s gap ≈ 3 frames, 0.3s ≈ 18 frames:
        # min_gap_frames=5 bridges the short gap, splits the long one
        segs = audio_dsp.segment_silence(pcm, threshold_dbfs=-40.0,
                                         frame=256, min_gap_frames=5)
        assert len(segs) == 2
        (a0, a1), (b0, b1) = segs
        # first segment spans tone+gap+tone (frame-quantized bounds)
        assert a0 <= 255 and abs(a1 - (2 * len(tone) + len(gs))) <= 256
        assert abs(b0 - (2 * len(tone) + len(gs) + len(gl))) <= 256
        assert b1 == len(pcm)

    def test_segment_silence_min_gap_one_splits_both(self):
        pcm, sr, *_ = self._speech_like()
        segs = audio_dsp.segment_silence(pcm, frame=256, min_gap_frames=1)
        assert len(segs) == 3

    def test_segment_silence_edge_cases(self):
        assert audio_dsp.segment_silence(np.array([], np.float32)) == []
        assert audio_dsp.segment_silence(np.zeros(4096, np.float32)) == []
        # all-voiced clip = one segment covering everything
        segs = audio_dsp.segment_silence(_sine(dur=0.2))
        assert segs == [(0, len(_sine(dur=0.2)))]

    def test_min_seg_frames_drops_blips(self):
        sr = 16000
        blip = _sine(freq=440, sr=sr, dur=0.016, amp=0.5)  # ~1 frame
        long = _sine(freq=440, sr=sr, dur=0.2, amp=0.5)
        pcm = np.concatenate([blip, np.zeros(sr // 2, np.float32), long])
        segs = audio_dsp.segment_silence(pcm, frame=256, min_gap_frames=2,
                                         min_seg_frames=4)
        assert len(segs) == 1 and segs[0][1] == len(pcm)


class TestLoudness:
    def test_gain_reaches_target_when_headroom(self):
        pcm = _sine(amp=0.05)  # RMS ≈ -29 dBFS, peak -26: room to -20
        g, lim = audio_dsp.loudness_gain_db(pcm, target_dbfs=-20.0)
        assert not lim
        assert audio_dsp.rms_dbfs(pcm * 10 ** (g / 20)) == pytest.approx(
            -20.0, abs=0.05)

    def test_gain_peak_limited(self):
        # crest factor of a sine is 3 dB: normalizing RMS to -1 dBFS
        # would push the peak past full scale -> limited to peak=0 dBFS
        pcm = _sine(amp=0.1)
        g, lim = audio_dsp.loudness_gain_db(pcm, target_dbfs=-1.0)
        assert lim
        assert audio_dsp.peak_dbfs(pcm * 10 ** (g / 20)) == pytest.approx(
            0.0, abs=0.05)

    def test_silence_gets_zero_gain(self):
        assert audio_dsp.loudness_gain_db(
            np.zeros(1000, np.float32)) == (0.0, False)


def _payload_batch(pcms, sr=16000):
    rows = [codecs.encode(p, sr, "pcm_s16le") for p in pcms]
    return pa.table({
        "clip_id": pa.array([f"c{i}" for i in range(len(rows))]),
        "codec": pa.array(["pcm_s16le"] * len(rows)),
        "bytes": pa.array(rows, pa.large_binary()),
    })


def test_silence_segment_stage_rows():
    from mail_deduplicate_ray.stages.audio_stats import SilenceSegmentStage
    sr = 16000
    tone = _sine(freq=440, sr=sr, dur=0.1, amp=0.5)
    gap = np.zeros(int(sr * 0.3), np.float32)
    two_seg = np.concatenate([tone, gap, tone])
    out = SilenceSegmentStage(min_gap_frames=5)(_payload_batch(
        [two_seg, np.zeros(4096, np.float32), tone], sr))
    df = out.to_pandas()
    # clip c0 -> 2 segments, c1 (silence) -> none, c2 -> 1 segment
    assert list(df[df.clip_id == "c0"].seg_idx) == [0, 1]
    assert (df[df.clip_id == "c0"].n_segs_of_clip == 2).all()
    assert "c1" not in set(df.clip_id)
    assert len(df[df.clip_id == "c2"]) == 1
    seg = df[(df.clip_id == "c0") & (df.seg_idx == 1)].iloc[0]
    assert seg.start_ms == pytest.approx(400, abs=20)   # tone+gap = 0.4s
    assert seg.end_ms == pytest.approx(500, abs=20)
    assert abs(seg.seg_rms_mdb - (-9031)) < 300         # 0.5-amp sine RMS


def test_loudness_stage_matches_kernels():
    from mail_deduplicate_ray.stages.audio_stats import LoudnessStage
    pcms = [_sine(amp=0.05), _sine(amp=0.1), np.zeros(1000, np.float32)]
    df = LoudnessStage(target_dbfs=-20.0)(_payload_batch(pcms)).to_pandas()
    assert df.audio_ok.all()
    for i, p in enumerate(pcms):
        g, lim = audio_dsp.loudness_gain_db(p, -20.0)
        assert df.gain_mdb[i] == round(g * 1000)
        assert bool(df.limited[i]) == lim


class TestDTW:
    def test_identity_is_zero_and_deterministic(self):
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp
        rng = np.random.default_rng(21)
        env = rng.normal(size=40)
        assert audio_dsp.dtw_cost(env, env) == 0.0
        c1 = audio_dsp.dtw_cost(env, env + rng.normal(scale=0.1, size=40))
        c2 = audio_dsp.dtw_cost(env, env + 0)  # unchanged input
        assert c2 == 0.0 and c1 > 0

    def test_stretch_aligns_where_linear_diff_fails(self):
        # a 1.5x time-stretched envelope must DTW-align near-zero while
        # an unrelated envelope stays far — the property that makes DTW
        # a verify channel for re-timed audio
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp
        t = np.linspace(0, 4 * np.pi, 48)
        a = np.sin(t)
        b = np.sin(np.linspace(0, 4 * np.pi, 72))   # stretched 1.5x
        rng = np.random.default_rng(22)
        other = rng.normal(size=48)
        close = audio_dsp.dtw_cost(a, b)
        far = audio_dsp.dtw_cost(a, other)
        assert close < 0.05, close
        assert far > 5 * close, (close, far)

    def test_gain_invariance(self):
        # z-normalization: a scaled + offset envelope costs ~0
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp
        t = np.linspace(0, 2 * np.pi, 30)
        a = np.sin(t)
        assert audio_dsp.dtw_cost(a, 3.0 * a + 7.0) < 1e-9

    def test_batch_matches_scalar_kernel(self):
        # dtw_cost_batch is the scalar recurrence run as one tensor DP;
        # it must be bit-comparable to per-pair dtw_cost across varied
        # lengths (incl. the empty-side inf contract) and chunk splits
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp
        rng = np.random.default_rng(31)
        CAP = 32
        K = 57
        na = rng.integers(0, CAP + 1, size=K)   # include empty sides
        nb = rng.integers(0, CAP + 1, size=K)
        na[0], nb[0] = 0, 12
        na[1], nb[1] = 12, 0
        A = np.zeros((K, CAP))
        B = np.zeros((K, CAP))
        for k in range(K):
            A[k, :na[k]] = rng.normal(size=na[k])
            B[k, :nb[k]] = rng.normal(size=nb[k])
        # make a few pairs genuinely similar so thresholds get exercised
        for k in range(5, 10):
            n = max(4, min(na[k], CAP))
            na[k] = nb[k] = n
            A[k, :n] = np.sin(np.linspace(0, 3, n))
            B[k, :n] = 2.0 * A[k, :n] + 1.0
        got = audio_dsp.dtw_cost_batch(A, na, B, nb, chunk=13)
        for k in range(K):
            want = audio_dsp.dtw_cost(A[k, :na[k]], B[k, :nb[k]])
            if np.isinf(want):
                assert np.isinf(got[k]), k
            else:
                assert abs(got[k] - want) < 1e-12, (k, got[k], want)
        assert audio_dsp.dtw_cost_batch(
            np.zeros((0, CAP)), np.zeros(0, np.int64),
            np.zeros((0, CAP)), np.zeros(0, np.int64)).shape == (0,)

    def test_envelope_shape_tracks_duration(self):
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp
        sr = 8000
        n = np.arange(sr)
        # amplitude-modulated tone: the envelope has real SHAPE (a flat
        # envelope z-normalizes into noise and can't align)
        pcm = (0.6 + 0.4 * np.sin(2 * np.pi * 3 * n / sr)) \
            * np.sin(2 * np.pi * 440 * n / sr)
        e1 = audio_dsp.energy_envelope(pcm, sr)           # 1 s
        e2 = audio_dsp.energy_envelope(np.tile(pcm, 2), sr)  # 2 s
        assert len(e2) == 2 * len(e1)
        assert e1.dtype == np.float32
        # stretched signal -> stretched envelope aligns by DTW
        stretched = np.repeat(pcm, 2)  # crude 2x stretch
        es = audio_dsp.energy_envelope(stretched, sr)
        rng = np.random.default_rng(23)
        close = audio_dsp.dtw_cost(e1, es)
        far = audio_dsp.dtw_cost(e1, rng.normal(size=len(e1)))
        # frame regridding leaves a small residual; the separation from
        # an unrelated envelope is what the verify threshold exploits
        assert close < 0.12, close
        assert far > 3 * close, (close, far)


class TestQualityKernels:
    def test_clipping_ratio(self):
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp
        sine = 0.5 * np.sin(np.linspace(0, 40 * np.pi, 4000))
        assert audio_dsp.clipping_ratio(sine) == 0.0
        clipped = np.clip(3.0 * sine, -1.0, 1.0)
        r = audio_dsp.clipping_ratio(clipped)
        assert r > 0.3, r  # hard-limited most of the waveform
        assert audio_dsp.clipping_ratio(np.empty(0)) == 0.0

    def test_spectral_flatness_separates_tone_from_noise(self):
        import numpy as np
        from mail_deduplicate_ray.functions import audio_dsp
        n = np.arange(16384)
        tone = np.sin(2 * np.pi * 440 * n / 8000)
        rng = np.random.default_rng(31)
        noise = rng.normal(scale=0.3, size=16384)
        f_tone = audio_dsp.spectral_flatness(tone)
        f_noise = audio_dsp.spectral_flatness(noise)
        assert f_tone < 0.01, f_tone
        assert f_noise > 0.5, f_noise


class TestSincResampler:
    def test_pitch_shift_and_snr(self):
        # speed-up by f shifts a sine's frequency to 440*f at the same
        # sr; the Blackman-sinc kernel must stay > 80 dB SNR vs the ideal
        sr = 16000
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        for f in (0.9, 1.1, 1.25):
            y = audio_dsp.resample_sinc(x, f)
            assert abs(len(y) - round(len(x) / f)) <= 1
            ti = np.arange(len(y)) / sr
            ideal = np.sin(2 * np.pi * 440 * f * ti)
            sl = slice(16, -16)
            err = y[sl] - ideal[sl]
            snr = 10 * np.log10(np.mean(ideal[sl] ** 2)
                                / max(np.mean(err ** 2), 1e-30))
            assert snr > 80, (f, snr)

    def test_antialiasing_on_speedup(self):
        # a tone above the post-speedup cutoff must be attenuated, not
        # folded: 7.6 kHz sped up 1.25x folds at 8 kHz Nyquist; the
        # 16-tap Blackman-sinc measures -55 dB there (cutoff 6.4 kHz +
        # one transition band)
        sr = 16000
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * 7600 * t).astype(np.float32)
        y = audio_dsp.resample_sinc(x, 1.25)
        rms_in = float(np.sqrt(np.mean(x ** 2)))
        rms_out = float(np.sqrt(np.mean(y[32:-32] ** 2)))
        assert rms_out < 0.01 * rms_in, (rms_in, rms_out)

    def test_identity_factor(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(4000).astype(np.float32)
        y = audio_dsp.resample_sinc(x, 1.0)
        assert len(y) == len(x)
        sl = slice(16, -16)
        err = float(np.sqrt(np.mean((y[sl] - x[sl]) ** 2)))
        assert err < 1e-3

    def test_edge_cases(self):
        import pytest
        assert len(audio_dsp.resample_sinc(np.zeros(0, np.float32), 1.1)) == 0
        with pytest.raises(ValueError):
            audio_dsp.resample_sinc(np.zeros(10, np.float32), 0.0)

    def test_polyphase_matches_naive_grid(self):
        # the rational fast path must agree with the direct evaluation
        # of the same windowed-sinc on the same t_j grid
        rng = np.random.default_rng(11)
        x = rng.standard_normal(8000).astype(np.float32)
        taps = 16
        offs = np.arange(1 - taps, taps + 1)
        for f in (0.9, 1.1, 1.12, 1.25):
            y1 = audio_dsp.resample_sinc(x, f)
            n = len(x)
            n_out = max(int(round(n / f)), 1)
            t = np.arange(n_out) * f
            base = np.floor(t).astype(np.int64)
            frac = (t - base)[:, None] - offs[None, :]
            c = min(1.0, 1.0 / f)
            core = c * np.sinc(frac * c)
            w = frac / taps
            win = np.where(np.abs(w) <= 1.0,
                           0.42 + 0.5 * np.cos(np.pi * w)
                           + 0.08 * np.cos(2 * np.pi * w), 0.0)
            k = base[:, None] + offs[None, :]
            kc = np.clip(k, 0, n - 1)
            val = (k >= 0) & (k < n)
            y2 = np.sum(np.where(val, x.astype(np.float64)[kc], 0.0)
                        * core * win, axis=1).astype(np.float32)
            assert float(np.max(np.abs(y1 - y2))) < 1e-6, f


class TestSpeedPerturbStage:
    def test_emits_per_factor_and_drops_undecodable(self):
        from mail_deduplicate_ray.stages.audio_stats import SpeedPerturbStage
        sr = 16000
        x = _sine(sr=sr, dur=0.5, amp=0.5)
        t = pa.table({
            "clip_id": ["good", "bad"],
            "bytes": pa.array([codecs.encode_pcm16(x, sr), b"notawav"],
                              pa.binary()),
            "codec": ["pcm_s16le", "pcm_s16le"],
            "transcript": ["hello", "world"],
        })
        out = SpeedPerturbStage(factors=(0.9, 1.1))(t)
        assert out.num_rows == 2            # bad row dropped, 2 factors
        rows = {r["clip_id"]: r for r in out.to_pylist()}
        assert set(rows) == {"good#sp900", "good#sp1100"}
        for fm, r in ((900, rows["good#sp900"]), (1100, rows["good#sp1100"])):
            assert r["orig_clip_id"] == "good"
            assert r["factor_milli"] == fm
            assert r["codec"] == "pcm_s16le"
            assert r["transcript"] == "hello"
            assert abs(r["dur_ms"] - round(500 * 1000 / fm)) <= 2
            pcm, sr2 = codecs.decode(r["bytes"], "pcm_s16le")
            assert sr2 == sr
            assert abs(len(pcm) - round(len(x) * 1000 / fm)) <= 2
