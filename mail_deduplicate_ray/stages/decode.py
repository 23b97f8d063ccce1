"""Decode stage: `bytes` -> audio fingerprint, then DROP the payload column.

Actor-pool `map_batches` stage (callable class: decoders + SRP planes built
once per actor — ref analogue: the process-pool initializer installing
``_WORKER`` state, deduplicate.py:529-541).

Mirrors the reference's resilience contract: a malformed payload becomes a
rejection row, never an exception (ref: deduplicate.py:563-576 returns a
rejection instead of raising; charset cascade mail.py:384-407).

The `bytes` column is dropped on the way out — the dehydration lesson
(ref: mail.py:228-262): after feature extraction downstream blocks carry
only scalar columns, so object-store blocks stay small at 100 TB scale.
"""

from __future__ import annotations

from struct import error as struct_error

import numpy as np
import pyarrow as pa

from mail_deduplicate_ray import codecs
from mail_deduplicate_ray.config import DedupConfig
from mail_deduplicate_ray.functions import simhash


class DecodeStage:
    """map_batches(DecodeStage, fn_constructor_args=(cfg,), concurrency=N,
    batch_format="pyarrow")."""

    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.srp = simhash.SRP(cfg.spectral_dims, cfg.audio_bits, cfg.audio_seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = batch.num_rows
        if "n_bytes" not in batch.column_names:
            # payload length: the cheap per-row content version the
            # checkpoint staleness key pairs with clip_id (≙ StaleKey's
            # (size, mtime_ns), ref: cache.py:64-69) — a re-ingested row
            # with changed bytes is re-decoded on resume
            batch = batch.append_column(
                "n_bytes", pc.cast(pc.binary_length(batch["bytes"]),
                                   pa.int64()))
        # zero-copy payload access: slice memoryviews off the Arrow data
        # buffer instead of to_pylist() (which copies every payload into a
        # Python bytes object — pure DRAM traffic at 36 KB/row)
        arr = batch["bytes"].combine_chunks()
        odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        off = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset:arr.offset + n + 1]
        mv = memoryview(arr.buffers()[2]) if arr.buffers()[2] is not None \
            else memoryview(b"")
        valid = (None if arr.null_count == 0 else
                 pc.is_valid(arr).to_numpy(zero_copy_only=False))
        declared = batch["codec"].to_pylist()
        fps = np.zeros(n, dtype=np.uint64)
        ok = np.zeros(n, dtype=bool)
        reasons = [""] * n
        # decode per row (variable-length codec parse), then ONE batched
        # FFT + binning over the zero-padded prefixes — per-row numpy
        # setup dominated this stage (profiled ~3x win).  Only the FFT
        # window prefix is CONVERTED (max_samples): the rest of each clip
        # never leaves the parquet-decoded buffer.
        pcm_rows = np.zeros((n, simhash._FFT_WINDOW), dtype=np.float64)
        srs = np.zeros(n, dtype=np.int64)
        for i in range(n):
            if valid is not None and not valid[i]:
                reasons[i] = "decode_failed"
                continue
            try:
                pcm, sr = codecs.decode(mv[off[i]:off[i + 1]],
                                        declared[i] or None,
                                        max_samples=simhash._FFT_WINDOW)
                # clips shorter than 8 samples decode fine and are KEPT
                # (zero feature vector, like spectral_features' floor) —
                # rejection is reserved for actual decode failures
                w = min(len(pcm), simhash._FFT_WINDOW)
                pcm_rows[i, :w] = pcm[:w]
                srs[i] = sr
                ok[i] = True
            except NotImplementedError:
                reasons[i] = "codec_unavailable"
            except (ValueError, struct_error):
                reasons[i] = "decode_failed"
        feats = np.zeros((n, self.cfg.spectral_dims), dtype=np.float32)
        if ok.any():
            feats[ok] = simhash.spectral_features_batch(
                pcm_rows[ok], srs[ok], self.cfg.spectral_dims)
            fps[ok] = self.srp.fingerprint(feats[ok])
        out = batch.drop_columns(["bytes"])
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), self.cfg.spectral_dims)
        return (
            out.append_column("audio_fp", pa.array(fps))
            .append_column("audio_feat", feat_arr)
            .append_column("decode_ok", pa.array(ok))
            .append_column("decode_reason", pa.array(reasons, pa.string()))
        )
