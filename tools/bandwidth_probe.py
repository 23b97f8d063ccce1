"""Control experiment: is the signature stage's poor local-CPU scaling
DRAM-bandwidth, not engine structure?

Runs the EXACT FusedDecodeSignatureStage serially in K independent OS
processes (no Ray, no shuffles, no shared state — perfect scaling is
structurally possible) over the same cached corpus rows, at K=8 and K=32,
and reports aggregate rows/s and the 8->32 efficiency.  A second variant
stubs the FFT out (features = zeros) to isolate the spectral pipeline's
memory traffic.  If the full stage scales poorly here while the no-FFT
variant scales better, the residual is the box's shared DRAM controller —
outside engine control, and absent on a real multi-node cluster where
every node brings its own memory system.

Usage:  python tools/bandwidth_probe.py [corpus_file.parquet]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _worker(path: str, no_fft: bool, n_batches: int, out) -> None:
    sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
    import pyarrow.parquet as pq

    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.functions import simhash
    from mail_deduplicate_ray.stages.signature import FusedDecodeSignatureStage

    if no_fft:
        import numpy as np
        simhash.spectral_features_batch = (
            lambda pcm, srs, dims: np.zeros((len(srs), dims),
                                            dtype=np.float32))
    t = pq.ParquetFile(path).read_row_group(0)
    stage = FusedDecodeSignatureStage(DedupConfig())
    stage(t.slice(0, 256))  # warm
    rows = 0
    t0 = time.time()
    for i in range(n_batches):
        off = (i * 256) % max(1, t.num_rows - 256)
        stage(t.slice(off, 256))
        rows += 256
    out.put((rows, time.time() - t0))


def run(path: str, k: int, no_fft: bool, n_batches: int = 24) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(path, no_fft, n_batches, q))
             for _ in range(k)]
    for p in procs:
        p.start()
    tot_rows, tot_t = 0, 0.0
    for _ in procs:
        r, dt = q.get()
        tot_rows += r
        tot_t = max(tot_t, dt)
    for p in procs:
        p.join()
    return tot_rows / tot_t


if __name__ == "__main__":
    import glob
    import json
    default = sorted(glob.glob(
        "/tmp/mdr_cache/clips-*/part-0000.parquet"))
    path = sys.argv[1] if len(sys.argv) > 1 else default[-1]
    out = {}
    for label, no_fft in (("full_stage", False), ("no_fft", True)):
        r8 = run(path, 8, no_fft)
        r32 = run(path, 32, no_fft)
        out[label] = {"rows_s_8procs": round(r8), "rows_s_32procs": round(r32),
                      "eff_8_to_32": round((r32 / r8) / 4, 3)}
    print(json.dumps(out))
