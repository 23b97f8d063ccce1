"""Per-clip audio analysis stage: loudness / activity stats over FULL
decoded PCM.

Actor-pool ``map_batches`` stage (decoder state once per actor, like
DecodeStage).  Unlike the signature path — which converts only the FFT
window prefix — this stage decodes every sample (loudness is a whole-clip
property), so batch_size must stay small: batch x concurrency x full-PCM
must fit the worker heap.  Output is scalar columns only; the payload is
dropped on the way out (the dehydration rule, ref: mail.py:228-262).

Levels are reported in integer milli-dB (and counts), keeping outputs
hash-stable across platforms the way the cents convention does for money.
"""

from __future__ import annotations

from struct import error as struct_error

import numpy as np
import pyarrow as pa

from mail_deduplicate_ray import codecs
from mail_deduplicate_ray.functions import audio_dsp


def iter_decoded(batch: pa.Table):
    """Yield ``(row_index, pcm, sr)`` for every decodable payload row —
    zero-copy Arrow-buffer slices into ``codecs.decode`` (the same
    memoryview idiom as the signature stage; no ``to_pylist`` of the
    binary column).  Undecodable rows are silently skipped: callers
    mark them absent via their own ``ok`` accounting."""
    import pyarrow.compute as pc
    n = batch.num_rows
    arr = batch["bytes"].combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset:arr.offset + n + 1]
    mv = memoryview(arr.buffers()[2]) if arr.buffers()[2] is not None \
        else memoryview(b"")
    valid = (None if arr.null_count == 0 else
             pc.is_valid(arr).to_numpy(zero_copy_only=False))
    declared = batch["codec"].to_pylist()
    for i in range(n):
        if valid is not None and not valid[i]:
            continue
        try:
            pcm, sr = codecs.decode(mv[off[i]:off[i + 1]],
                                    declared[i] or None)
        except (NotImplementedError, ValueError, struct_error):
            continue
        yield i, pcm, sr


class AudioStatsStage:
    """map_batches(AudioStatsStage, concurrency=N, batch_format="pyarrow")."""

    def __init__(self, trim_threshold_dbfs: float = -40.0) -> None:
        self.trim_threshold_dbfs = trim_threshold_dbfs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = batch.num_rows
        arr = batch["bytes"].combine_chunks()
        odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        off = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset:arr.offset + n + 1]
        mv = memoryview(arr.buffers()[2]) if arr.buffers()[2] is not None \
            else memoryview(b"")
        valid = (None if arr.null_count == 0 else
                 pc.is_valid(arr).to_numpy(zero_copy_only=False))
        declared = batch["codec"].to_pylist()

        rms_mdb = np.full(n, -240_000, dtype=np.int64)
        centroid_mhz = np.zeros(n, dtype=np.int64)
        snr_mdb = np.zeros(n, dtype=np.int64)
        peak_mdb = np.full(n, -240_000, dtype=np.int64)
        zcross = np.zeros(n, dtype=np.int64)
        n_samples = np.zeros(n, dtype=np.int64)
        active_samples = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            if valid is not None and not valid[i]:
                continue
            try:
                pcm, _sr = codecs.decode(mv[off[i]:off[i + 1]],
                                         declared[i] or None)
            except (NotImplementedError, ValueError, struct_error):
                continue
            ok[i] = True
            n_samples[i] = len(pcm)
            rms_mdb[i] = round(audio_dsp.rms_dbfs(pcm) * 1000)
            peak_mdb[i] = round(audio_dsp.peak_dbfs(pcm) * 1000)
            zcross[i] = audio_dsp.zero_crossings(pcm)
            lo, hi = audio_dsp.trim_silence(pcm, self.trim_threshold_dbfs)
            active_samples[i] = hi - lo
            centroid_mhz[i] = round(
                audio_dsp.spectral_centroid_hz(pcm, _sr) * 1000)
            snr_mdb[i] = round(audio_dsp.snr_estimate_db(pcm) * 1000)
        out = batch.drop_columns(["bytes"])
        return (out.append_column("audio_ok", pa.array(ok))
                .append_column("n_samples", pa.array(n_samples))
                .append_column("rms_mdb", pa.array(rms_mdb))
                .append_column("peak_mdb", pa.array(peak_mdb))
                .append_column("zero_crossings", pa.array(zcross))
                .append_column("active_samples", pa.array(active_samples))
                .append_column("centroid_mhz", pa.array(centroid_mhz))
                .append_column("snr_mdb", pa.array(snr_mdb)))


class SilenceSegmentStage:
    """Silence-split segmentation: ONE OUTPUT ROW PER VOICED SEGMENT —
    the row-multiplying audio operator (≙ the hopping-window explode
    shape on the events table).  Each segment carries sample and
    millisecond bounds plus its own RMS, so downstream stages (per-
    segment transcription, per-segment dedup) consume segments as
    first-class rows without re-decoding the clip."""

    def __init__(self, threshold_dbfs: float = -40.0, frame: int = 256,
                 min_gap_frames: int = 2, min_seg_frames: int = 1) -> None:
        self.threshold_dbfs = threshold_dbfs
        self.frame = frame
        self.min_gap_frames = min_gap_frames
        self.min_seg_frames = min_seg_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["clip_id"].to_pylist()
        clip_id, seg_idx = [], []
        start_ms, end_ms = [], []
        seg_rms_mdb, n_segs_of_clip = [], []
        for i, pcm, sr in iter_decoded(batch):
            segs = audio_dsp.segment_silence(
                pcm, self.threshold_dbfs, self.frame,
                self.min_gap_frames, self.min_seg_frames)
            for k, (lo, hi) in enumerate(segs):
                clip_id.append(ids[i])
                seg_idx.append(k)
                start_ms.append(round(lo * 1000 / sr))
                end_ms.append(round(hi * 1000 / sr))
                seg_rms_mdb.append(
                    round(audio_dsp.rms_dbfs(pcm[lo:hi]) * 1000))
                n_segs_of_clip.append(len(segs))
        return pa.table({
            "clip_id": pa.array(clip_id, pa.string()),
            "seg_idx": pa.array(seg_idx, pa.int32()),
            "start_ms": pa.array(start_ms, pa.int64()),
            "end_ms": pa.array(end_ms, pa.int64()),
            "seg_rms_mdb": pa.array(seg_rms_mdb, pa.int64()),
            "n_segs_of_clip": pa.array(n_segs_of_clip, pa.int32()),
        })


class LoudnessStage:
    """Per-clip loudness normalization plan: RMS/peak levels and the
    peak-limited gain that would bring the clip to ``target_dbfs``
    (integer milli-dB outputs — the hash-stable cents convention)."""

    def __init__(self, target_dbfs: float = -20.0) -> None:
        self.target_dbfs = target_dbfs

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        rms_mdb = np.full(n, -240_000, dtype=np.int64)
        peak_mdb = np.full(n, -240_000, dtype=np.int64)
        gain_mdb = np.zeros(n, dtype=np.int64)
        limited = np.zeros(n, dtype=bool)
        for i, pcm, _sr in iter_decoded(batch):
            ok[i] = True
            rms_mdb[i] = round(audio_dsp.rms_dbfs(pcm) * 1000)
            peak_mdb[i] = round(audio_dsp.peak_dbfs(pcm) * 1000)
            g, lim = audio_dsp.loudness_gain_db(pcm, self.target_dbfs)
            gain_mdb[i] = round(g * 1000)
            limited[i] = lim
        out = batch.drop_columns(["bytes"])
        return (out.append_column("audio_ok", pa.array(ok))
                .append_column("rms_mdb", pa.array(rms_mdb))
                .append_column("peak_mdb", pa.array(peak_mdb))
                .append_column("gain_mdb", pa.array(gain_mdb))
                .append_column("limited", pa.array(limited)))


class MelEmbeddingStage:
    """Per-clip log-mel embedding: (clip_id, embedding, audio_ok); the
    payload is dropped on exit (dehydration rule).  The mel filterbank
    is built once per (sr, frame, n_mels) inside the actor and cached —
    classic init-once state (ST1)."""

    def __init__(self, n_mels: int = 24, frame: int = 512) -> None:
        self.n_mels = n_mels
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dims = 2 * self.n_mels
        embs = np.zeros((n, dims), np.float32)
        ok = np.zeros(n, dtype=bool)
        for i, pcm, sr in iter_decoded(batch):
            ok[i] = True
            embs[i] = audio_dsp.log_mel_embedding(pcm, sr, self.n_mels,
                                                  self.frame)
        out = batch.drop_columns(["bytes"])
        return (out.append_column(
                    "embedding", pa.array(embs.tolist(),
                                          pa.list_(pa.float32(), dims)))
                .append_column("audio_ok", pa.array(ok)))

class MelEnvelopeStage:
    """ONE decode pass producing BOTH per-clip features the DTW pair
    pipeline needs — log-mel embedding (candidate signal) and energy
    envelope (verify signal): (clip_id, embedding, envelope, audio_ok).
    Fusing them halves decode cost and, critically, keeps the pipeline
    to a single actor pool (two concurrent decode pools can starve a
    small cluster's CPU slots — the bounded-pool rule in
    pipelines/neardup.py)."""

    def __init__(self, n_mels: int = 24, frame: int = 512,
                 frame_ms: int = 32) -> None:
        self.n_mels = n_mels
        self.frame = frame
        self.frame_ms = frame_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dims = 2 * self.n_mels
        embs = np.zeros((n, dims), np.float32)
        envs: list[list[float]] = [[] for _ in range(n)]
        ok = np.zeros(n, dtype=bool)
        for i, pcm, sr in iter_decoded(batch):
            ok[i] = True
            embs[i] = audio_dsp.log_mel_embedding(pcm, sr, self.n_mels,
                                                  self.frame)
            envs[i] = audio_dsp.energy_envelope(
                pcm, sr, self.frame_ms).tolist()
        out = batch.drop_columns(["bytes"])
        return (out.append_column(
                    "embedding", pa.array(embs.tolist(),
                                          pa.list_(pa.float32(), dims)))
                .append_column("envelope",
                               pa.array(envs, pa.list_(pa.float32())))
                .append_column("audio_ok", pa.array(ok)))


class QualityGateStage:
    """Audio QUALITY GATE — the corpus-curation screen run before any
    dedup/training pass: per clip (clip_id, audio_ok, clipping_pm,
    flatness_m, snr_mdb, dur_ms_true, keep, reason).  Gates: hard
    clipping <= ``max_clip_pm`` per-mille, spectral flatness within
    [min_flat_m, max_flat_m] milli (flags pure test tones AND raw
    noise), SNR >= ``min_snr_mdb``, true decoded duration within
    bounds.  First failing gate names the reason (the rejection-row
    convention, ref deduplicate.py:563-576); integer milli units keep
    the output engine-portable."""

    def __init__(self, max_clip_pm: int = 5, min_flat_m: int = 1,
                 max_flat_m: int = 990, min_snr_mdb: int = 3000,
                 min_dur_ms: int = 150, max_dur_ms: int = 30_000) -> None:
        self.max_clip_pm = max_clip_pm
        self.min_flat_m = min_flat_m
        self.max_flat_m = max_flat_m
        self.min_snr_mdb = min_snr_mdb
        self.min_dur_ms = min_dur_ms
        self.max_dur_ms = max_dur_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        clip_pm = np.zeros(n, np.int64)
        flat_m = np.zeros(n, np.int64)
        snr = np.zeros(n, np.int64)
        dur = np.zeros(n, np.int64)
        keep = np.zeros(n, dtype=bool)
        reasons = [""] * n
        for i, pcm, sr in iter_decoded(batch):
            ok[i] = True
            clip_pm[i] = int(round(audio_dsp.clipping_ratio(pcm) * 1000))
            flat_m[i] = int(round(
                audio_dsp.spectral_flatness(pcm) * 1000))
            snr[i] = int(round(audio_dsp.snr_estimate_db(pcm) * 1000))
            dur[i] = int(round(len(pcm) * 1000 / sr)) if sr else 0
            if clip_pm[i] > self.max_clip_pm:
                reasons[i] = "clipping"
            elif not self.min_flat_m <= flat_m[i] <= self.max_flat_m:
                reasons[i] = "tonality"
            elif snr[i] < self.min_snr_mdb:
                reasons[i] = "snr"
            elif not self.min_dur_ms <= dur[i] <= self.max_dur_ms:
                reasons[i] = "duration"
            else:
                keep[i] = True
        undec = ~ok
        for i in np.flatnonzero(undec):
            reasons[i] = "undecodable"
        out = batch.drop_columns(["bytes"])
        return (out.append_column("audio_ok", pa.array(ok))
                .append_column("clipping_pm", pa.array(clip_pm, pa.int64()))
                .append_column("flatness_m", pa.array(flat_m, pa.int64()))
                .append_column("snr_mdb", pa.array(snr, pa.int64()))
                .append_column("dur_ms_true", pa.array(dur, pa.int64()))
                .append_column("keep", pa.array(keep))
                .append_column("gate_reason", pa.array(reasons,
                                                       pa.string())))


class SpeedPerturbStage:
    """Kaldi-style speed-perturbation augmentation: for every decodable
    clip, emit one re-encoded copy per tempo factor (playback at the
    same sample rate, so pitch shifts with speed — the standard 3-way
    0.9/1.0/1.1 training-data recipe minus the identity copy, which the
    original row already is).

    ``map_batches(SpeedPerturbStage, concurrency=N)`` actor-pool stage:
    the Blackman-sinc kernel (audio_dsp.resample_sinc) is anti-aliased,
    vectorized, and a different kernel family from the synth
    generator's resample_linear — augmented copies are INDEPENDENT
    planted truth for the flagship's stretch channel.  Output rows are
    CLIPS_SCHEMA-compatible (plus orig_clip_id / factor_milli), so
    original ∪ augmented feeds any downstream clips pipeline directly.
    Undecodable rows are dropped (the augmentation analogue of
    rejection rows: nothing to perturb)."""

    def __init__(self, factors: tuple[float, ...] = (0.9, 1.1)) -> None:
        self.factors = tuple(factors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["clip_id"].to_pylist()
        tr = batch["transcript"].to_pylist()
        cid, orig, fmilli, payload = [], [], [], []
        srs, durs, trs = [], [], []
        for i, pcm, sr in iter_decoded(batch):
            for f in self.factors:
                y = audio_dsp.resample_sinc(pcm, f)
                fm = int(round(f * 1000))
                cid.append(f"{ids[i]}#sp{fm}")
                orig.append(ids[i])
                fmilli.append(fm)
                payload.append(codecs.encode_pcm16(y, sr))
                srs.append(sr)
                durs.append(int(round(len(y) * 1000 / sr)))
                trs.append(tr[i])
        return pa.table({
            "clip_id": pa.array(cid, pa.string()),
            "orig_clip_id": pa.array(orig, pa.string()),
            "factor_milli": pa.array(fmilli, pa.int32()),
            "bytes": pa.array(payload, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(["pcm_s16le"] * len(cid), pa.string()),
            "transcript": pa.array(trs, pa.string()),
        })
