"""Flagship recall evaluation against the synthetic corpus's planted
ground truth — the durable version of the ad-hoc scripts behind the
BASELINE.md recall-at-scale rows.

Usage:
    python tools/eval_recall.py [sf_dir] [n_base] [--channels a,b,c]

Runs the flagship over the cached corpus ``clips-<sf>-<n_base>-42-g*``
(generating it Ray-parallel if absent), scores predicted clusters
against ``<corpus>.truth.json``, and prints one JSON line:
overall dup-pair recall, per-duplicate-kind pair recall, wall seconds
and stage times.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_base = int(args[1]) if len(args) > 1 else None
    channels = None
    mode = "tonal"
    cfg_over = {}
    for a in sys.argv[1:]:
        if a.startswith("--channels"):
            channels = tuple(a.split("=", 1)[1].split(","))
        if a.startswith("--stretch-cap"):
            cfg_over["stretch_max_bucket"] = int(a.split("=", 1)[1])
        if a.startswith("--mode"):
            mode = a.split("=", 1)[1]
        if a.startswith("--cfg="):
            k, v = a.split("=", 2)[1:]
            cfg_over[k] = float(v) if "." in v else int(v)

    import ray
    if not ray.is_initialized():
        import os
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    from mail_deduplicate_ray.config import DedupConfig
    from mail_deduplicate_ray.pipelines import clips, neardup

    path = clips.clips_path(sf_dir, n_base, mode=mode)
    truth = json.loads((path.parent / f"{path.name}.truth.json")
                       .read_text())
    # prefer kind-attributed pairs (caches written after round 4 store
    # them); non-outlier kinds only — same contract as recall_pairs
    if "pairs" in truth:
        pairs = [p for p in truth["pairs"] if p[2] != "outlier"]
    else:
        pairs = truth.get("recall_pairs", [])

    t0 = time.perf_counter()
    res = neardup.dedup_clips(clips.read_clips(sf_dir, n_base, mode=mode),
                              DedupConfig(**cfg_over), channels=channels)
    pred: dict[str, str] = {}
    for b in res.settled.select_columns(["clip_id", "cluster_id"]) \
            .iter_batches(batch_format="pyarrow"):
        for cid, cl in zip(b["clip_id"].to_pylist(),
                           b["cluster_id"].to_pylist()):
            pred[cid] = cl
    wall = time.perf_counter() - t0

    def hit(a: str, b: str) -> bool:
        return pred.get(a) is not None and pred.get(a) == pred.get(b)

    n_hit = sum(1 for a, b, *_ in pairs if hit(a, b))

    # pair PRECISION: of all predicted same-cluster pairs, how many are
    # truth pairs (closure over ALL planted pairs, outlier chains
    # included — the chain edge is a legitimate detection; eviction is
    # settle's job).  Exact count via per-cluster truth-label histogram:
    # sum C(n_cl, 2) over (cluster, truth-label) cells / sum C(n_c, 2).
    t_parent: dict = {}

    def t_find(x):
        t_parent.setdefault(x, x)
        while t_parent[x] != x:
            t_parent[x] = t_parent[t_parent[x]]
            x = t_parent[x]
        return x

    for item in truth["pairs"]:
        ra, rb = t_find(item[0]), t_find(item[1])
        if ra != rb:
            lo, hi = sorted((ra, rb))
            t_parent[hi] = lo
    from collections import Counter
    by_cluster: dict = {}
    for cid_, cl in pred.items():
        by_cluster.setdefault(cl, []).append(cid_)
    p_num = p_den = 0
    for members in by_cluster.values():
        m = len(members)
        if m < 2:
            continue
        p_den += m * (m - 1) // 2
        for _, k2 in Counter(t_find(x) for x in members).items():
            p_num += k2 * (k2 - 1) // 2
    pair_precision = round(p_num / p_den, 5) if p_den else 1.0
    by_kind: dict[str, list[int]] = {}
    for item in pairs:
        if len(item) >= 3:
            a, b, k = item[0], item[1], item[2]
        else:
            a, b, k = item[0], item[1], "?"
        d = by_kind.setdefault(k, [0, 0])
        d[1] += 1
        d[0] += hit(a, b)
    print(json.dumps({
        "corpus": path.name,
        "n_clips": len(pred) + res.stats.to_dict().get("mail_rejected", 0),
        "n_pairs": len(pairs),
        "recall": round(n_hit / max(len(pairs), 1), 5),
        "pair_precision": pair_precision,
        "by_kind": {k: {"recall": round(h / max(n, 1), 5), "n": n}
                    for k, (h, n) in sorted(by_kind.items())},
        "wall_sec": round(wall, 1),
        "clips_per_sec": round(len(pred) / wall, 1),
        "stage_times": {k: round(v, 2)
                        for k, v in res.stage_times.items()},
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
