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


_COUNTER_HELP = {
    "mail_found": "clips read from sources",
    "mail_rejected": "rejected (missing metadata / decode failure)",
    "mail_retained": "retained for deduplication",
    "mail_unique": "singleton clusters",
    "mail_skipped": "in clusters skipped by thresholds/strategies",
    "mail_evicted": "evicted as threshold outliers (kept)",
    "mail_selected": "selected to keep by a strategy",
    "mail_discarded": "discarded as duplicates",
    "set_total": "duplicate clusters",
    "set_single": "clusters of one",
    "set_skipped_threshold": "clusters skipped: incoherent thresholds",
    "set_skipped_strategies": "clusters skipped: no effective strategy",
    "set_deduplicated": "clusters deduplicated",
}


def render_report(stats: "RunStats", overflow_dropped: int = 0,
                  dry_run: bool = False) -> str:
    """Human-readable per-run summary table (≙ the reference's final
    report, ref: cli.py:683-686 + Stat table deduplicate.py:65-144)."""
    lines = ["── run report " + "─" * 34]
    for key in _COUNTER_HELP:
        lines.append(f"{key:<24} {stats[key]:>10,}  {_COUNTER_HELP[key]}")
    lines.append(f"{'overflow_dropped':<24} {overflow_dropped:>10,}  "
                 "candidate rows dropped by bucket caps")
    if dry_run:
        lines.append("dry-run: no actions applied")
    lines.append("─" * 48)
    return "\n".join(lines)


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
    counters, summed on the driver (≙ Counter merge deduplicate.py:1110).

    Set-level counters use the ``set_anchor`` column the settle stage
    stamps on exactly one row per cluster (its min clip_id), so partials
    are pure vectorized value-counts and the driver holds a counter per
    DISTINCT reason string (a handful), never per cluster."""
    import pyarrow.compute as pc

    def partials(t: pa.Table) -> pa.Table:
        kinds, values = [], []
        vc = pc.value_counts(t["reason"])
        for r, n in zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()):
            kinds.append(_REASON_TO_MAIL.get(r, "mail_other"))
            values.append(n)
        anchored = t.filter(t["set_anchor"])
        vc = pc.value_counts(anchored["set_reason"])
        for r, n in zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()):
            kinds.append(f"set_{r}")
            values.append(n)
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "n": pa.array(values, pa.int64())})

    stats = RunStats()
    for batch in settled.map_batches(partials, batch_format="pyarrow") \
                        .iter_batches(batch_format="pyarrow"):
        for kind, n in zip(batch["kind"].to_pylist(),
                           batch["n"].to_pylist()):
            stats.counters[kind] += n
    stats.counters["set_total"] = sum(
        v for k, v in stats.counters.items() if k.startswith("set_"))
    retained = sum(v for k, v in stats.counters.items()
                   if k.startswith("mail_"))
    if n_rejected is None:  # derive from the same pass — no extra count()
        n_rejected = n_found - retained
    stats.counters["mail_found"] = n_found
    stats.counters["mail_rejected"] = n_rejected
    stats.counters["mail_retained"] = n_found - n_rejected
    return stats
