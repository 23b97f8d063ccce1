"""Run metrics + consistency invariants.

Re-expresses the reference's ``Stat`` counters (deduplicate.py:65-144) and
the ``check_stats`` cross-invariants (deduplicate.py:1319-1398) as a plain
dict derived from the settled output's ``reason`` / ``set_reason`` columns
(per-batch partial counters summed on the driver — no extra shuffle).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import pyarrow as pa

import ray.data


@dataclass
class RunStats:
    counters: Counter = field(default_factory=Counter)

    def __getitem__(self, k: str) -> int:
        return int(self.counters.get(k, 0))

    def to_dict(self) -> dict[str, int]:
        return {k: int(v) for k, v in sorted(self.counters.items())}

    def check(self) -> None:
        """Invariants from deduplicate.py:1319-1398 (engine self-check)."""
        c = self
        assert c["mail_found"] == c["mail_rejected"] + c["mail_retained"], \
            (c["mail_found"], c["mail_rejected"], c["mail_retained"])
        assert c["mail_retained"] == (
            c["mail_unique"] + c["mail_skipped"] + c["mail_evicted"]
            + c["mail_discarded"] + c["mail_selected"]), c.to_dict()
        assert c["set_total"] == (
            c["set_single"] + c["set_skipped_threshold"]
            + c["set_skipped_strategies"] + c["set_deduplicated"]), c.to_dict()


_REASON_TO_MAIL = {
    "unique": "mail_unique",
    "skipped": "mail_skipped",
    "evicted": "mail_evicted",
    "discarded": "mail_discarded",
    "selected": "mail_selected",
}


def collect_stats(settled: "ray.data.Dataset", n_found: int,
                  n_rejected: int | None = None) -> RunStats:
    """One streaming pass over the settled output: per-batch partial
    counters, summed on the driver (≙ Counter merge deduplicate.py:1110)."""

    def partials(t: pa.Table) -> pa.Table:
        c = Counter()
        reasons = t["reason"].to_pylist()
        for r in reasons:
            c[_REASON_TO_MAIL.get(r, "mail_other")] += 1
        # set-level: count each cluster once, attributed to the batch that
        # holds its min clip_id row? clusters never span batches after
        # map_groups only if one group per output block is not guaranteed —
        # so count (cluster_id, set_reason) pairs and dedup on the driver.
        pairs = sorted({(cid, sr) for cid, sr in
                        zip(t["cluster_id"].to_pylist(),
                            t["set_reason"].to_pylist())})
        return pa.table({
            "kind": pa.array(
                [*(k for k in c), *("__set__",) * len(pairs)], pa.string()),
            "value": pa.array(
                [*(str(v) for v in c.values()),
                 *(f"{cid}\x00{sr}" for cid, sr in pairs)], pa.string()),
        })

    stats = RunStats()
    seen_sets: set[str] = set()
    for batch in settled.map_batches(partials, batch_format="pyarrow") \
                        .iter_batches(batch_format="pyarrow"):
        for kind, value in zip(batch["kind"].to_pylist(),
                               batch["value"].to_pylist()):
            if kind == "__set__":
                if value not in seen_sets:
                    seen_sets.add(value)
                    sr = value.split("\x00", 1)[1]
                    stats.counters[f"set_{sr}"] += 1
                    stats.counters["set_total"] += 1
            else:
                stats.counters[kind] += int(value)
    retained = sum(v for k, v in stats.counters.items()
                   if k.startswith("mail_"))
    if n_rejected is None:  # derive from the same pass — no extra count()
        n_rejected = n_found - retained
    stats.counters["mail_found"] = n_found
    stats.counters["mail_rejected"] = n_rejected
    stats.counters["mail_retained"] = n_found - n_rejected
    return stats
