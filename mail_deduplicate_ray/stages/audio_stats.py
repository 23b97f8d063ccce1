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
