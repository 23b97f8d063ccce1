"""Distributed connected components: min-label propagation over Ray Data.

Replaces the reference's driver-held hash index (deduplicate.py:710-717) with
a shuffle-native algorithm: every node starts labelled with its own id; each
round every node's label flows to its neighbors and every node adopts the
minimum label heard (hash-min propagation).  All grouping uses the bucketed
partition idiom (stages/bucketing.py): the shuffle key is an int bucket,
per-partition work is vectorized pandas (merge + groupby-min) — no
per-node Python calls.

Convergence: labels are monotonically non-increasing, so a round with
``sum(changed) == 0`` is a fixpoint; LSH candidate clusters are near-stars
(stages/candidates.py emits representative edges), so 2-4 rounds typical;
``max_rounds`` caps defensively.  At 10^12-node scale the same loop gets
large-star/small-star contraction to bound rounds at O(log n) (PAPERS.md:
BTS, ICDE 2024) — the seam is this function.

Determinism: labels are clip_id strings, min is lexicographic — identical
output at any parallelism (≙ min-path link target, deduplicate.py:1168).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from mail_deduplicate_ray.stages.bucketing import (BUCKET_COL, add_bucket,
                                                   hash_to_buckets)


def _both_directions(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def flip(t: pa.Table) -> pa.Table:
        fwd = pa.table({"node": t["src"], "nbr": t["dst"]})
        rev = pa.table({"node": t["dst"], "nbr": t["src"]})
        return pa.concat_tables([fwd, rev])
    return edges.map_batches(flip, batch_format="pyarrow")


def _driver_union_find(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """In-memory union-find for small edge sets (the candidate-pair table is
    orders of magnitude smaller than the corpus).  Produces the same
    min-label output as the distributed path."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for b in edges.select_columns(["src", "dst"]) \
                  .iter_batches(batch_format="pyarrow"):
        for s, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            rs, rd = find(s), find(d)
            if rs != rd:
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo
    nodes = list(parent)
    labels = [find(n) for n in nodes]
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.string()),
        "label": pa.array(labels, pa.string())}))


def connected_components(edges: "ray.data.Dataset", max_rounds: int = 10,
                         nbuckets: int = 64,
                         driver_threshold: int = 2_000_000,
                         ) -> "ray.data.Dataset":
    """edges(src,dst) -> labels(node,label); covers nodes appearing in edges
    (singletons are defaulted by attach_cluster_ids).

    Edge sets up to ``driver_threshold`` rows run in-memory union-find on
    the driver (≙ the reference's driver-held hash index — the edge table
    is the *duplicate pairs*, a small fraction of the corpus even at scale);
    beyond it, the distributed min-label propagation below runs entirely as
    bucketed shuffles.  Both produce identical min-label output."""
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        return _driver_union_find(edges)
    adj = add_bucket(_both_directions(edges), "node", nbuckets).materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["node"].drop_duplicates()
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = adj.groupby(BUCKET_COL).map_groups(
        lambda df: init_labels(df), batch_format="pandas").materialize()

    for _ in range(max_rounds):
        # co-partition labels with adjacency by node-bucket, emit messages
        lab_b = add_bucket(labels, "node", nbuckets)
        tagged_l = lab_b.map_batches(
            lambda t: t.append_column("nbr", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow")
        tagged_e = adj.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "label": pa.nulls(t.num_rows, pa.string()),
                                BUCKET_COL: t[BUCKET_COL],
                                "nbr": t["nbr"]}),
            batch_format="pyarrow")

        def send(df: pd.DataFrame) -> pd.DataFrame:
            ldf = df[df["nbr"].isna()][["node", "label"]]
            adf = df[df["nbr"].notna()][["node", "nbr"]]
            m = adf.merge(ldf, on="node", how="left")
            out = pd.DataFrame({"node": m["nbr"], "label": m["label"],
                                "is_self": 0})
            self_rows = pd.DataFrame({"node": ldf["node"],
                                      "label": ldf["label"], "is_self": 1})
            return pd.concat([out.dropna(subset=["label"]), self_rows],
                             ignore_index=True)

        msgs = tagged_l.union(tagged_e).groupby(BUCKET_COL).map_groups(
            lambda df: send(df.drop(columns=[BUCKET_COL])),
            batch_format="pandas")

        def adopt(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", sort=False)["label"]
            new = g.min()
            old = df[df["is_self"] == 1].set_index("node")["label"]
            old = old[~old.index.duplicated()]
            out = new.reset_index()
            out.columns = ["node", "label"]
            out["changed"] = (out["label"]
                              != old.reindex(out["node"]).values).astype(int)
            return out

        new_labels = add_bucket(msgs, "node", nbuckets) \
            .groupby(BUCKET_COL).map_groups(
                lambda df: adopt(df.drop(columns=[BUCKET_COL])),
                batch_format="pandas").materialize()
        changed = int(new_labels.sum("changed") or 0)
        labels = new_labels.drop_columns(["changed"])
        if changed == 0:
            break
    return labels


def attach_cluster_ids(rows: "ray.data.Dataset", labels: "ray.data.Dataset",
                       key: str = "clip_id",
                       num_partitions: int = 32,
                       broadcast_threshold: int = 5_000_000,
                       ) -> "ray.data.Dataset":
    """Attach cluster labels onto full rows.  Rows absent from ``labels``
    are singletons -> cluster_id = own key.

    Labels are the *duplicate* nodes only, so they are usually the small
    side: up to ``broadcast_threshold`` rows they travel once via
    ``ray.put`` and each batch does a dict lookup (no shuffle — the
    broadcast-join idiom).  Bigger label sets use the hash-partitioned
    ``Dataset.join``."""
    names = list(rows.schema().names)
    n_labels = labels.count()

    if n_labels <= broadcast_threshold:
        mapping: dict[str, str] = {}
        for b in labels.iter_batches(batch_format="pyarrow"):
            mapping.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
        ref = ray.put(mapping)

        def lookup(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            keys = t[key].to_pylist()
            return t.append_column(
                "cluster_id",
                pa.array([m.get(k, k) for k in keys], pa.string()))

        return rows.map_batches(lookup, batch_format="pyarrow")

    joined = rows.join(labels, "left_outer", num_partitions,
                       on=(key,), right_on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cluster = pc.coalesce(t["label"], t[key])
        keepers = [n for n in t.schema.names if n in names]
        return t.select(keepers).append_column("cluster_id", cluster)

    return joined.map_batches(finish, batch_format="pyarrow")
