"""Distributed connected components over an edge Dataset.

Near-dup detection (ops/dedup.py) produces PAIRS; deduplication needs
CLUSTERS — "keep one document per connected component of the
similarity graph". Components are the classic iterative graph step a
batch engine cannot express in one shuffle, so this module runs
min-label propagation as a sequence of bucket shuffles:

- state: a (node, label) Dataset, label initialised to the node id;
- each round, every node sends its current label along its edges and
  adopts the minimum of its own label and everything it received;
- convergence when a round changes no label (the driver reads ONE
  aggregated counter per round — never the label table).

Each round is two co-partitioned groupbys (attach labels to edge
sources; min-combine messages per destination), so a component's
final label is the minimum node id in it — deterministic and
SQL-mirrorable (a recursive-CTE reachable-min computes the same
fixpoint). Rounds needed = the graph diameter; near-dup components
are overwhelmingly tiny cliques (diameter 1-2). For adversarial
long-chain graphs the hash-to-min variant (Rastogi et al. 2013,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds")
halves the round count exponentially; label propagation is kept here
because the similarity-graph workload never approaches that regime —
``max_rounds`` raises loudly rather than silently looping if one
does.

Partitioning assumption: a node's incident labels and messages are
complete within its hash bucket per round (the with_prior_window
contract); per-bucket memory is O(bucket's nodes + edges), never
O(graph).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .window import _bucket_of, _resolve_buckets


def connected_components(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int | None = None,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Label every node of the undirected graph ``edges`` with its
    component id = the MINIMUM node id reachable from it. Node ids
    must be non-null int64. Returns a (node, component) Dataset with
    one row per distinct node appearing in any edge. Isolated nodes
    (no edges) are the caller's to union in — an edge list cannot
    mention them."""
    n_buckets = _resolve_buckets(n_buckets, floor=64)

    def canon(b: pa.Table) -> pa.Table:
        if b[src].null_count or b[dst].null_count:
            raise ValueError("connected_components: null node ids")
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        # both directions: a message must flow each way every round
        return pa.table(
            {
                "node": np.concatenate([u, v]),
                "peer": np.concatenate([v, u]),
            }
        )

    adj = edges.map_batches(canon, batch_format="pyarrow").materialize()

    # initial labels: each distinct node labels itself (distinct via
    # one bucket groupby — no driver materialization)
    def tag_node(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False)
        return pa.table({"node": n, "_bucket": _bucket_of(n, n_buckets)})

    def init_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(g["node"].to_numpy())
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = (
        adj.map_batches(tag_node, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(init_bucket, batch_format="pandas")
        .materialize()
    )

    # union demands one schema: label rows carry a null peer, edge
    # rows a null label; both route by the NODE's bucket so a source's
    # label row lands in the same group as its outgoing edges
    def tag_label(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": b["node"],
                "label": b["label"],
                "peer": pa.nulls(len(b), type=pa.int64()),
                "_bucket": pa.array(_bucket_of(n, n_buckets)),
            }
        )

    def tag_adj(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": b["node"],
                "label": pa.nulls(len(b), type=pa.int64()),
                "peer": b["peer"],
                "_bucket": pa.array(_bucket_of(n, n_buckets)),
            }
        )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        # label rows have null peer; edge rows have null label
        lab = g[g["peer"].isna()]
        edge = g[g["peer"].notna()]
        lut = pd.Series(
            lab["label"].to_numpy(dtype=np.int64),
            index=lab["node"].to_numpy(dtype=np.int64),
        )
        msgs = pd.DataFrame(
            {
                "node": edge["peer"].to_numpy(dtype=np.int64),
                "label": lut[edge["node"].to_numpy(dtype=np.int64)].to_numpy(),
                "is_old": np.int64(0),
            }
        )
        keep = pd.DataFrame(
            {
                "node": lab["node"].to_numpy(dtype=np.int64),
                "label": lab["label"].to_numpy(dtype=np.int64),
                "is_old": np.int64(1),
            }
        )
        return pd.concat([keep, msgs], ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("node", sort=False)
        new = gb["label"].min()
        old = g[g["is_old"] == 1].set_index("node")["label"]
        changed = int((new.loc[old.index] < old).sum())
        out = new.reset_index()
        out["_changed"] = 0
        if len(out):
            out.loc[0, "_changed"] = changed  # one counter row per group
        return out

    for _ in range(max_rounds):
        both = labels.map_batches(tag_label, batch_format="pyarrow").union(
            adj.map_batches(tag_adj, batch_format="pyarrow")
        )
        msgs = (
            both.groupby("_bucket")
            .map_groups(send, batch_format="pandas")
            .map_batches(
                lambda b: b.append_column(
                    "_bucket",
                    pa.array(
                        _bucket_of(
                            b["node"].to_numpy(zero_copy_only=False), n_buckets
                        )
                    ),
                ),
                batch_format="pyarrow",
            )
        )
        stepped = (
            msgs.groupby("_bucket")
            .map_groups(combine, batch_format="pandas")
            .materialize()
        )
        changed = stepped.sum("_changed")
        labels = stepped.drop_columns(["_changed"])
        if not changed:
            return labels.map_batches(
                lambda b: b.rename_columns(["node", "component"]),
                batch_format="pyarrow",
            )
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_rounds} rounds — "
        "graph diameter exceeds the label-propagation budget; use a "
        "hash-to-min variant for long-chain graphs"
    )
