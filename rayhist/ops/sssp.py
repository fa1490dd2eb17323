"""Distributed bounded-round weighted shortest paths (Bellman-Ford).

Single-source-set shortest path DISTANCES over an undirected,
positively-integer-weighted edge Dataset: round r relaxes every edge
once — dist[v] <- min(dist[v], min over edges (dist[u] + w)) — so
after R rounds each node holds the exact cheapest cost over paths of
at most R edges. All arithmetic is int64 (the money rule: costs are
exact at any parallelism), the "unreached" marker is the finite
sentinel ``INF = 1 << 62`` (never a null — a unioned null int column
coerces to float64 and large sentinels do not survive the round
trip), and the fixed round count makes the oracle expressible: the
same relaxation unrolls as a MATERIALIZED CTE chain (each level
referenced twice; inlining would duplicate the prefix exponentially —
the k-core lesson).

Each round is the cc.py/bfs.py co-group shape: dist rows + adjacency
rows routed by SOURCE bucket -> per-peer min cost messages; messages
+ dist table routed by TARGET bucket -> min relax. Two bucket
shuffles per round, nothing on the driver.

Size gate (the triangles/k-core/bfs convention): when the node count
fits ``broadcast_gate``, each round is one map_batches over the
materialized adjacency with the (nodes, dist) arrays ray.put-broadcast
and a |touched nodes x blocks|-bounded driver min-combine; gate=0
forces the message rounds (pinned equal in tests).

Reference parity: the reference has no graph engine; this extends the
bounded-hop BFS (ops/bfs.py) to weighted costs, the standard
Pregel-style relaxation (Malewicz et al., SIGMOD'10) expressed as Ray
Data bucket shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .window import _bucket_of, _resolve_buckets

INF = 1 << 62
_MAX_W = 1 << 40  # rounds * max_w must stay clear of the sentinel


def sssp_int(
    edges: ray.data.Dataset,
    seed_pred,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    n_buckets: int | None = None,
    broadcast_gate: int = 2_000_000,
) -> pd.DataFrame:
    """(node, dist) for every node whose cheapest <=``rounds``-edge
    path cost from the seed set ``seed_pred(node_ids) -> bool mask``
    is finite, over the undirected graph ``edges`` (distinct canonical
    pairs with a positive int64 ``weight`` column expected). Exact
    int64 costs, bit-identical at any parallelism."""
    if rounds < 0 or rounds > (1 << 20):
        raise ValueError("sssp_int: rounds must be in [0, 2^20]")
    n_buckets = _resolve_buckets(n_buckets, floor=64)

    def directed(b: pa.Table) -> pa.Table:
        u = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        wcol = b[weight]
        if wcol.null_count:
            raise ValueError("sssp_int: null edge weight")
        w = wcol.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) and (w.min() <= 0 or w.max() >= _MAX_W):
            raise ValueError("sssp_int: edge weights must be in (0, 2^40)")
        n = np.concatenate([u, v])
        return pa.table(
            {
                "node": n,
                "peer": np.concatenate([v, u]),
                "w": np.concatenate([w, w]),
                "_bucket": _bucket_of(n, n_buckets),
            }
        )

    adj = edges.map_batches(directed, batch_format="pyarrow").materialize()

    def init_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.unique(g["node"].to_numpy(dtype=np.int64))})

    nodes = (
        adj.groupby("_bucket").map_groups(init_nodes, batch_format="pandas").materialize()
    )
    if nodes.count() <= broadcast_gate:
        return _sssp_broadcast(adj, nodes, seed_pred, rounds)
    return _sssp_distributed(adj, nodes, seed_pred, rounds, n_buckets)


def _sssp_broadcast(adj, nodes, seed_pred, rounds) -> pd.DataFrame:
    """Below-gate path: the dist vector lives on the driver and is
    ray.put-broadcast each round; per-batch (peer -> min cand)
    partials come back bounded by |touched nodes| x #blocks."""
    arr = np.sort(nodes.to_pandas()["node"].to_numpy(dtype=np.int64))
    dist = np.where(np.asarray(seed_pred(arr), dtype=bool), 0, INF).astype(np.int64)

    for _ in range(rounds):
        ref = ray.put((arr, dist))

        def cand(b: pa.Table) -> pa.Table:
            nd, dd = ray.get(ref)
            s = b["node"].to_numpy(zero_copy_only=False)
            d = dd[np.searchsorted(nd, s)]
            ok = d < INF
            if not ok.any():
                return pa.table(
                    {"node": np.empty(0, np.int64), "cand": np.empty(0, np.int64)}
                )
            c = d[ok] + b["w"].to_numpy(zero_copy_only=False)[ok]
            g = (
                pd.DataFrame(
                    {"node": b["peer"].to_numpy(zero_copy_only=False)[ok], "cand": c}
                )
                .groupby("node", sort=False)["cand"]
                .min()
            )
            return pa.table(
                {
                    "node": g.index.to_numpy(dtype=np.int64),
                    "cand": g.to_numpy(dtype=np.int64),
                }
            )

        parts = adj.map_batches(cand, batch_format="pyarrow").to_pandas()
        if len(parts):
            m = parts.groupby("node")["cand"].min()
            pos = np.searchsorted(arr, m.index.to_numpy(dtype=np.int64))
            dist[pos] = np.minimum(dist[pos], m.to_numpy(dtype=np.int64))
    keep = dist < INF
    return pd.DataFrame({"node": arr[keep], "dist": dist[keep]}).reset_index(drop=True)


def _sssp_distributed(adj, nodes, seed_pred, rounds, n_buckets) -> pd.DataFrame:
    """Above-gate path: (node, dist) table updated by two-shuffle
    relaxation rounds; the driver never sees the dist table until the
    final reached-set read."""

    def init_dist(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False)
        is_seed = np.asarray(seed_pred(n), dtype=bool)
        return pa.table(
            {
                "node": n,
                "dist": np.where(is_seed, 0, INF).astype(np.int64),
                "_bucket": _bucket_of(n, n_buckets),
            }
        )

    dist = nodes.map_batches(init_dist, batch_format="pyarrow").materialize()

    for _ in range(rounds):

        def tag_dist(b: pa.Table) -> pa.Table:
            z = np.zeros(len(b), dtype=np.int64)
            return pa.table(
                {
                    "node": b["node"],
                    "dist": b["dist"],
                    "peer": z - 1,
                    "w": z,
                    "_kind": z + 1,
                    "_bucket": b["_bucket"],
                }
            )

        def tag_adj(b: pa.Table) -> pa.Table:
            z = np.zeros(len(b), dtype=np.int64)
            return pa.table(
                {
                    "node": b["node"],
                    "dist": z + INF,
                    "peer": b["peer"],
                    "w": b["w"],
                    "_kind": z,
                    "_bucket": b["_bucket"],
                }
            )

        def send(g: pd.DataFrame) -> pd.DataFrame:
            st = g[g["_kind"] == 1]
            st = st[st["dist"] < INF][["node", "dist"]]
            ed = g[g["_kind"] == 0][["node", "peer", "w"]]
            j = ed.merge(st, on="node")
            if not len(j):
                return pd.DataFrame(
                    {"node": np.empty(0, np.int64), "cand": np.empty(0, np.int64)}
                )
            j["cand"] = j["dist"].to_numpy(dtype=np.int64) + j["w"].to_numpy(
                dtype=np.int64
            )
            m = j.groupby("peer", sort=False)["cand"].min()
            return pd.DataFrame(
                {
                    "node": m.index.to_numpy(dtype=np.int64),
                    "cand": m.to_numpy(dtype=np.int64),
                }
            )

        def relax(g: pd.DataFrame) -> pd.DataFrame:
            st = g[g["_kind"] == 1]
            msg = g[g["_kind"] == 0]
            n = st["node"].to_numpy(dtype=np.int64)
            d = st["dist"].to_numpy(dtype=np.int64).copy()
            if len(msg):
                m = msg.groupby("node")["dist"].min()
                pos = np.searchsorted(n, m.index.to_numpy(dtype=np.int64))
                # dist rows are complete per bucket: every message
                # target exists in this bucket's state by construction
                d[pos] = np.minimum(d[pos], m.to_numpy(dtype=np.int64))
            return pd.DataFrame({"node": n, "dist": d})

        msgs = (
            dist.map_batches(tag_dist, batch_format="pyarrow")
            .union(adj.map_batches(tag_adj, batch_format="pyarrow"))
            .groupby("_bucket")
            .map_groups(send, batch_format="pandas")
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "dist": b["cand"],
                        "_kind": np.zeros(len(b), dtype=np.int64),
                        "_bucket": _bucket_of(
                            b["node"].to_numpy(zero_copy_only=False), n_buckets
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        flagged = dist.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "dist": b["dist"],
                    "_kind": np.ones(len(b), dtype=np.int64),
                    "_bucket": b["_bucket"],
                }
            ),
            batch_format="pyarrow",
        )
        dist = (
            msgs.union(flagged)
            .groupby("_bucket")
            .map_groups(
                lambda g: relax(g.sort_values("node", kind="stable")),
                batch_format="pandas",
            )
            .map_batches(
                lambda b: b.append_column(
                    "_bucket",
                    pa.array(
                        _bucket_of(b["node"].to_numpy(zero_copy_only=False), n_buckets)
                    ),
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

    out = (
        dist.map_batches(
            lambda b: b.select(["node", "dist"]).filter(
                pa.compute.less(b["dist"], INF)
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return out.astype({"node": "int64", "dist": "int64"})
