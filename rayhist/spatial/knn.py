"""kNN proximity queries and ANN cosine top-k.

The reference has no kNN operator; this is a target-only component
(BASELINE.json north_rule: "kNN proximity queries"). Design:

- ``knn_points``: broadcast the (small) query-point matrix, compute
  per-batch distances vectorized (numpy), keep the per-batch top-k
  candidates per query, then reduce the candidate stream to the global
  top-k. Work per batch is O(|batch| x |queries|) with no shuffle; the
  final reduce sees only ``k x n_batches x n_queries`` rows.
- ``ann_cosine_topk``: same pattern over an embedding column
  (list<float>) with a matmul kernel — brute-force exact baseline. At
  scale, the documented path is IVF-style bucketing: assign vectors to
  coarse centroids in one pass, groupby(bucket), and probe only
  matching buckets (same candidate->reduce shape).

Determinism: candidates are ranked by (metric, neighbor_id) so ties
break identically everywhere — required for oracle equality and for
parallelism-invariance across num_cpus levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _topk_reduce(cands: pd.DataFrame, k: int, by: str, ascending: bool) -> pd.DataFrame:
    cands = cands.sort_values(
        ["query_id", by, "neighbor_id"], ascending=[True, ascending, True], kind="mergesort"
    )
    out = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def knn_points(
    points: ray.data.Dataset,
    queries: list[tuple],  # (query_id:int, lon_e7:int, lat_e7:int)
    k: int = 3,
    id_col: str = "osm_id",
) -> pd.DataFrame:
    """Exact kNN by squared euclidean distance in e7 coordinate space.

    ``queries`` is broadcast into the stage closure (tiny); the
    candidate reduce happens on the small per-batch top-k stream.
    A query point never matches itself (neighbor_id != query_id).
    """
    q = np.asarray([(a, b, c) for a, b, c in queries], dtype=np.int64)

    def stage(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lon = batch["lon_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch["lat_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
        frames = []
        for qid, qlon, qlat in q:
            dx = lon - np.float64(qlon)
            dy = lat - np.float64(qlat)
            d2 = dx * dx + dy * dy
            mask = ids != qid
            cand_ids = ids[mask]
            cand_d2 = d2[mask]
            take = min(k, len(cand_ids))
            if take == 0:
                continue
            part = np.argpartition(cand_d2, take - 1)[:take]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(take, qid, dtype=np.int64),
                        "neighbor_id": cand_ids[part],
                        "dist2": cand_d2[part],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "dist2": pd.Series([], dtype="float64")}
            )
        return pd.concat(frames, ignore_index=True)

    cands = points.map_batches(stage, batch_format="pyarrow").to_pandas()
    return _topk_reduce(cands, k, by="dist2", ascending=True)


def ann_cosine_topk(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Brute-force cosine top-k over an embedding column.

    The query matrix is looked up from the dataset itself (small id
    list), L2-normalized once, and broadcast; each batch does one
    matmul. Ranking by (-cos, neighbor_id); self-matches excluded.
    """
    import pyarrow.compute as pc

    qset = sorted(int(i) for i in set(query_ids))
    qrows = (
        embeddings.map_batches(
            lambda b: b.filter(pc.is_in(b[id_col], pa.array(qset, type=b[id_col].type))),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(id_col)
    )
    qids = qrows[id_col].to_numpy(dtype=np.int64)
    qmat = np.stack(qrows[vec_col].to_numpy()).astype(np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)

    def stage(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = qmat @ mat.T  # (nq, nb)
        frames = []
        for i, qid in enumerate(qids):
            s = sims[i]
            mask = ids != qid
            cid, cs = ids[mask], s[mask]
            take = min(k, len(cid))
            if take == 0:
                continue
            part = np.argpartition(-cs, take - 1)[:take]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(take, qid, dtype=np.int64),
                        "neighbor_id": cid[part],
                        "cos_sim": cs[part],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             "cos_sim": pd.Series([], dtype="float64")}
        )

    cands = embeddings.map_batches(stage, batch_format="pyarrow").to_pandas()
    return _topk_reduce(cands, k, by="cos_sim", ascending=False)
