"""Distributed connected components: min-label propagation over Ray Data.

Replaces the reference's driver-held hash index (deduplicate.py:710-717) with
a shuffle-native algorithm: every node starts labelled with its own id;
each round every node sends its current label to its neighbors and adopts
the minimum label it hears (hash-min propagation).  Rounds are two
``groupby(node)`` shuffles each; convergence is detected by summing a
``changed`` flag (labels are monotonically non-increasing, so sum==0 ⟺
fixpoint).  LSH candidate clusters are near-cliques (the representative
edge scheme in stages/candidates.py emits stars per bucket), so the
diameter — and thus round count — is small (2-4 typical); ``max_rounds``
caps it defensively.  At 10^12-node scale the same loop applies with
large-star/small-star contraction to bound rounds at O(log n); tracked as a
follow-up (PAPERS.md: BTS, ICDE 2024).

Determinism: labels are clip_id strings, min is lexicographic — the same
winner at any parallelism (≙ the reference's deterministic min-path link
target, deduplicate.py:1168).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def _both_directions(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    def flip(t: pa.Table) -> pa.Table:
        fwd = pa.table({"node": t["src"], "nbr": t["dst"]})
        rev = pa.table({"node": t["dst"], "nbr": t["src"]})
        return pa.concat_tables([fwd, rev])
    return edges.map_batches(flip, batch_format="pyarrow")


def _gather_send(group: pd.DataFrame) -> pd.DataFrame:
    """Group = all rows for one node: its L row(s) (label) + E rows (nbrs).
    Emit the node's own label to itself (is_self=1) and to each neighbor."""
    labels = group.loc[group["kind"] == 0, "label"]
    lbl = labels.min() if len(labels) else group["node"].iloc[0]
    nbrs = group.loc[group["kind"] == 1, "nbr"]
    out_nodes = [group["node"].iloc[0], *nbrs.tolist()]
    is_self = [1] + [0] * len(nbrs)
    return pd.DataFrame({"node": out_nodes, "label": lbl, "is_self": is_self})


def _adopt_min(group: pd.DataFrame) -> pd.DataFrame:
    new = group["label"].min()
    own = group.loc[group["is_self"] == 1, "label"]
    old = own.min() if len(own) else group["node"].iloc[0]
    return pd.DataFrame({
        "node": [group["node"].iloc[0]],
        "label": [new],
        "changed": [1 if new != old else 0],
    })


def connected_components(edges: "ray.data.Dataset",
                         max_rounds: int = 10) -> "ray.data.Dataset":
    """edges(src,dst) -> labels(node,label); only nodes appearing in edges.

    Singletons never enter: attach_cluster_ids defaults them to their own id.
    """
    adj = _both_directions(edges).materialize()  # reused every round; small
    labels = adj.groupby("node").map_groups(
        lambda g: pd.DataFrame({"node": [g["node"].iloc[0]],
                                "label": [g["node"].iloc[0]]}),
        batch_format="pandas").materialize()
    for _ in range(max_rounds):
        tagged_l = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label"],
                                "nbr": pa.nulls(t.num_rows, pa.string()),
                                "kind": pa.array([0] * t.num_rows, pa.int8())}),
            batch_format="pyarrow")
        tagged_e = adj.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "label": pa.nulls(t.num_rows, pa.string()),
                                "nbr": t["nbr"],
                                "kind": pa.array([1] * t.num_rows, pa.int8())}),
            batch_format="pyarrow")
        msgs = tagged_l.union(tagged_e).groupby("node").map_groups(
            _gather_send, batch_format="pandas")
        new_labels = msgs.groupby("node").map_groups(
            _adopt_min, batch_format="pandas").materialize()
        changed = int(new_labels.sum("changed") or 0)
        labels = new_labels.drop_columns(["changed"]).materialize()
        if changed == 0:
            break
    return labels


def attach_cluster_ids(rows: "ray.data.Dataset", labels: "ray.data.Dataset",
                       key: str = "clip_id") -> "ray.data.Dataset":
    """Join cluster labels back onto full rows without Dataset.join:
    union-tag-groupby (one shuffle).  Rows absent from ``labels`` are
    singletons -> cluster_id = own key."""
    schema = rows.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def tag_rows(t: pa.Table) -> pa.Table:
        return (t.append_column("__label", pa.nulls(t.num_rows, pa.string()))
                 .append_column("__is_row", pa.array([True] * t.num_rows)))

    def tag_labels(t: pa.Table) -> pa.Table:
        cols = {name: pa.nulls(t.num_rows, types[name])
                for name in names if name != key}
        cols[key] = t["node"]
        out = pa.table({name: cols[name] for name in names})
        return (out.append_column("__label", t["label"])
                   .append_column("__is_row", pa.array([False] * t.num_rows)))

    def resolve(group: pa.Table) -> pa.Table:
        mask = group["__is_row"]
        real = group.filter(mask)
        lbls = group.filter(pa.compute.invert(mask))["__label"].to_pylist()
        cid = lbls[0] if lbls else real[key][0].as_py()
        out = real.drop_columns(["__label", "__is_row"])
        return out.append_column(
            "cluster_id", pa.array([cid] * out.num_rows, pa.string()))

    tagged = rows.map_batches(tag_rows, batch_format="pyarrow").union(
        labels.map_batches(tag_labels, batch_format="pyarrow"))
    return tagged.groupby(key).map_groups(resolve, batch_format="pyarrow")
