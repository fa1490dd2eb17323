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

from .. import io as rio


def _fp() -> str:
    """Cache-key version suffix for the IVF/LSH layout fixtures:
    fingerprint of this module's source (io.code_fingerprint) — any
    edit to the index builders forces a cold layout rebuild instead of
    serving stale partitions (round-4 stale-cache hazard class)."""
    import sys

    return rio.code_fingerprint(sys.modules[__name__])


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization, zero-norm safe: an all-zero embedding
    stays zero (cosine 0 vs everything) instead of NaN — a single NaN
    similarity would poison the shared top-k cut for every query in
    the batch."""
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(n == 0, 1.0, n)


def _topk_reduce(cands: pd.DataFrame, k: int, by: str, ascending: bool) -> pd.DataFrame:
    cands = cands.sort_values(
        ["query_id", by, "neighbor_id"], ascending=[True, ascending, True], kind="mergesort"
    )
    out = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def _resolve_topk_distributed(
    cands: ray.data.Dataset, k: int, by: str, ascending: bool, nqb: int = 64
) -> pd.DataFrame:
    """DISTRIBUTED per-query top-k resolve for ANN candidate streams —
    the ``knn_queries`` resolve pattern applied to the cosine family.

    Each scan block emits its own per-query top-k partials, so the
    global answer is a pure per-query reduce; grouping the partial
    stream by a query-id hash bucket (``nqb`` groups) and reducing
    each bucket in a worker keeps the driver transfer at the FINAL
    nq x k rows. The driver-side ``concat``-then-reduce this replaces
    was nq x k x #blocks rows — fine at sandbox block counts, a
    corpus-proportional driver materialization at 10^6 blocks.
    """
    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_qb"] = df["query_id"].to_numpy(dtype=np.int64) % nqb
        return df

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        return _topk_reduce(g.drop(columns=["_qb"]), k, by=by, ascending=ascending)

    out = (
        cands.map_batches(bucketize, batch_format="pandas")
        .groupby("_qb")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        # zero groups reach map_groups -> a schema-less frame; restore
        # the FULL typed column set (query_id/neighbor_id/<metric>/
        # rank), not just rank — callers select these by name
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             by: pd.Series([], dtype="float64"),
             "rank": pd.Series([], dtype="int64")}
        )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


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

    Vectorized ACROSS queries: each batch computes a (q_chunk x batch)
    squared-distance matrix and row-wise argpartitions it, so the
    per-batch cost is one BLAS-shaped pass instead of a Python loop
    per query. Chunking bounds the matrix at q_chunk x |batch| floats.
    """
    q = np.asarray([(a, b, c) for a, b, c in queries], dtype=np.int64)
    QCHUNK = 512  # 512 x 4096-row batch x 8B = 16 MiB distance matrix

    _EMPTY = pd.DataFrame(
        {"query_id": pd.Series([], dtype="int64"),
         "neighbor_id": pd.Series([], dtype="int64"),
         "dist2": pd.Series([], dtype="float64")}
    )

    def stage(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0 or len(q) == 0:
            return _EMPTY
        lon = batch["lon_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch["lat_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
        take = min(k, n)
        frames = []
        for s in range(0, len(q), QCHUNK):
            qc = q[s : s + QCHUNK]
            qid = qc[:, 0]
            dx = lon[None, :] - qc[:, 1].astype(np.float64)[:, None]
            dy = lat[None, :] - qc[:, 2].astype(np.float64)[:, None]
            d2 = dx * dx + dy * dy
            d2[ids[None, :] == qid[:, None]] = np.inf  # self-exclusion
            # argpartition keeps an ARBITRARY member of a distance tie
            # at the cut; emit every candidate at <= the k-th distance
            # so the global reduce's (dist2, neighbor_id) tie-break sees
            # all of them (exact e7-integer ties are realistic: 3-4-5).
            # Rows with < take finite candidates get kth=inf and emit
            # every finite candidate — same as the per-query take=min().
            part = np.argpartition(d2, take - 1, axis=1)[:, :take]
            kth = np.take_along_axis(d2, part, axis=1).max(axis=1)
            sel = (d2 <= kth[:, None]) & np.isfinite(d2)
            qi, ci = np.nonzero(sel)
            if len(qi) == 0:
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": qid[qi],
                        "neighbor_id": ids[ci],
                        "dist2": d2[qi, ci],
                    }
                )
            )
        if not frames:
            return _EMPTY
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
    qmat = _unit_rows(qmat)

    def stage(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        if n == 0:
            return _EMPTY_COS
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        mat = _unit_rows(mat)
        sims = qmat @ mat.T  # (nq, nb)
        return _emit_cos_topk(sims, qids, ids, k)

    cands = embeddings.map_batches(stage, batch_format="pyarrow")
    return _resolve_topk_distributed(cands, k, by="cos_sim", ascending=False)


_EMPTY_COS = pd.DataFrame(
    {"query_id": pd.Series([], dtype="int64"),
     "neighbor_id": pd.Series([], dtype="int64"),
     "cos_sim": pd.Series([], dtype="float64")}
)


def _emit_cos_topk(sims: np.ndarray, qids: np.ndarray, ids: np.ndarray, k: int) -> pd.DataFrame:
    """Row-wise tie-inclusive top-k emission over a (nq, n) similarity
    matrix — vectorized across queries (the per-query loop was the last
    Python hot path in the ANN stages). Self-matches and non-candidates
    must already be masked to -inf; rows with < k finite candidates get
    kth = -inf and emit every finite one, identical to the per-query
    take=min(k, n_valid) semantics."""
    n = sims.shape[1]
    sims[ids[None, :] == qids[:, None]] = -np.inf  # self-exclusion
    take = min(k, n)
    part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
    kth = np.take_along_axis(sims, part, axis=1).min(axis=1)
    sel = (sims >= kth[:, None]) & np.isfinite(sims)
    qi, ci = np.nonzero(sel)
    if len(qi) == 0:
        return _EMPTY_COS
    return pd.DataFrame(
        {"query_id": qids[qi], "neighbor_id": ids[ci], "cos_sim": sims[qi, ci]}
    )


def knn_points_grid(
    points: ray.data.Dataset,
    queries: list[tuple],
    k: int = 3,
    id_col: str = "osm_id",
    zoom: int | None = 6,
) -> pd.DataFrame:
    """EXACT grid-accelerated kNN — the scale path for many points.

    Per batch, points are bucketed by grid cell once; queries explore
    expanding cell rings around their own cells and a query stops when
    its k-th candidate distance is <= the guaranteed radius (the
    distance from the query point to the edge of the explored cell
    block) — every unexplored point is provably farther, so the
    per-batch candidate set contains the batch's true top-k and the
    global candidate reduce is exact. Same output contract as
    ``knn_points`` (ties broken by neighbor id).

    The sweep is vectorized ACROSS queries: round ``r`` gathers ring-r
    candidate rows for every still-active query in one numpy CSR-style
    expansion (searchsorted cell lookup, repeat/cumsum row expansion),
    then one lexsort over the accumulated (query, dist2) pairs yields
    every active query's running k-th distance for the guarantee test.
    There is no per-query Python loop — total work per batch is
    O(C log C) in the accumulated candidate count C.

    ``zoom=None`` picks the grid per batch: ~1 point per cell
    (exactness is zoom-independent — the guarantee radius adapts), which
    keeps ring rounds short for any batch size. Block count matters
    more than zoom: each block pays the full query set, so callers with
    many small blocks should ``repartition`` to O(num_cpus) blocks
    first (measured 256→32 blocks = 14x on the sandbox corpus).

    Does not wrap the antimeridian (distances are planar e7, as in
    ``knn_points``).
    """
    from ..model import LAT_MOD, LON_MOD
    from .grid import cell_id

    q = np.asarray([(a, b, c) for a, b, c in queries], dtype=np.int64)
    nq = len(q)
    if nq:
        qid_all = q[:, 0]
        qlon_all = q[:, 1].astype(np.float64)
        qlat_all = q[:, 2].astype(np.float64)

    def _ring_offsets(r: int) -> tuple[np.ndarray, np.ndarray]:
        # Chebyshev ring r: cells with max(|dx|,|dy|) == r, each once.
        if r == 0:
            return np.zeros(1, dtype=np.int64), np.zeros(1, dtype=np.int64)
        side = np.arange(-r, r + 1, dtype=np.int64)
        inner = np.arange(-r + 1, r, dtype=np.int64)
        dx = np.concatenate([side, side, np.full(len(inner), -r), np.full(len(inner), r)])
        dy = np.concatenate([np.full(len(side), -r), np.full(len(side), r), inner, inner])
        return dx, dy

    def stage(batch: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             "dist2": pd.Series([], dtype="float64")}
        )
        if nq == 0 or len(batch) == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lon = batch["lon_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch["lat_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
        if zoom is None:  # ~1 point per cell: 2^(2z-1) ≈ n
            z = min(10, max(3, int(round((np.log2(len(batch)) + 1) / 2))))
        else:
            z = zoom
        nx = 1 << z
        ny = max(1, 1 << (z - 1))
        w = LON_MOD / nx
        h = LAT_MOD / ny
        qx_all = (((q[:, 1] + LON_MOD // 2) % LON_MOD) * nx // LON_MOD).astype(np.int64)
        qy_all = np.minimum((q[:, 2] + LAT_MOD // 2) * ny // LAT_MOD, ny - 1).astype(np.int64)
        cells = cell_id(lon.astype(np.int64), lat.astype(np.int64), z)
        order = np.argsort(cells, kind="mergesort")
        sc = cells[order]
        uniq, starts = np.unique(sc, return_index=True)
        ends = np.r_[starts[1:], len(sc)]
        slon, slat, sids = lon[order], lat[order], ids[order]

        active = np.arange(nq)
        # accumulated candidates: query index / dist2 / neighbor id
        acc_q: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        acc_n: list[np.ndarray] = []
        for r in range(max(nx, ny)):
            if not active.size:
                break
            ax, ay = qx_all[active], qy_all[active]
            dxo, dyo = _ring_offsets(r)
            cx = ax[:, None] + dxo[None, :]
            cy = ay[:, None] + dyo[None, :]
            valid = (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
            cellv = (cy * nx + cx)[valid]
            qof = np.broadcast_to(active[:, None], cx.shape)[valid]
            pos = np.searchsorted(uniq, cellv)
            ok = (pos < len(uniq)) & (uniq[np.minimum(pos, len(uniq) - 1)] == cellv)
            pos, qof = pos[ok], qof[ok]
            cnt = ends[pos] - starts[pos]
            total = int(cnt.sum())
            if total:
                # CSR expansion: rows of each (query, cell) pair
                rows = (
                    np.repeat(starts[pos], cnt)
                    + np.arange(total)
                    - np.repeat(np.cumsum(cnt) - cnt, cnt)
                )
                qi = np.repeat(qof, cnt)
                dx = slon[rows] - qlon_all[qi]
                dy = slat[rows] - qlat_all[qi]
                d2 = dx * dx + dy * dy
                nbr = sids[rows]
                keep = nbr != qid_all[qi]  # a query never matches itself
                acc_q.append(qi[keep])
                acc_d.append(d2[keep])
                acc_n.append(nbr[keep])
            # guaranteed radius per active query: distance to the edge
            # of the explored (2r+1)-cell block
            x0 = (ax - r) * w - LON_MOD / 2
            x1 = (ax + r + 1) * w - LON_MOD / 2
            y0 = (ay - r) * h - LAT_MOD / 2
            y1 = (ay + r + 1) * h - LAT_MOD / 2
            ql, qt = qlon_all[active], qlat_all[active]
            guard = np.minimum(np.minimum(ql - x0, x1 - ql), np.minimum(qt - y0, y1 - qt))
            covered = (ax - r < 0) & (ax + r >= nx - 1) & (ay - r < 0) & (ay + r >= ny - 1)
            # running k-th distance per active query (one lexsort)
            kth = np.full(nq, np.inf)
            if acc_q:
                A = np.concatenate(acc_q)
                D = np.concatenate(acc_d)
                o2 = np.lexsort((D, A))
                As, Ds = A[o2], D[o2]
                first_q, first_i, per_cnt = np.unique(As, return_index=True, return_counts=True)
                has_k = per_cnt >= k
                kth[first_q[has_k]] = Ds[first_i[has_k] + k - 1]
            # strict <: a candidate tied exactly ON the explored-block
            # boundary may be owned by an unexplored cell (same rule
            # as knn_all); negative guards (antimeridian wrap of the
            # cell index vs raw planar coords) clamp to 0 = never done
            guard = np.maximum(guard, 0.0)
            done = (kth[active] < guard * guard) | covered
            active = active[~done]

        if not acc_q:
            return empty
        A = np.concatenate(acc_q)
        D = np.concatenate(acc_d)
        N = np.concatenate(acc_n)
        o2 = np.lexsort((D, A))
        As, Ds, Ns = A[o2], D[o2], N[o2]
        first_q, first_i, per_cnt = np.unique(As, return_index=True, return_counts=True)
        # per-pair k-th distance of its own query; keep D <= kth (ties kept)
        kth_of = Ds[first_i + np.minimum(per_cnt, k) - 1]
        sel = Ds <= np.repeat(kth_of, per_cnt)
        return pd.DataFrame(
            {"query_id": qid_all[As[sel]], "neighbor_id": Ns[sel], "dist2": Ds[sel]}
        )

    cands = points.map_batches(stage, batch_format="pyarrow").to_pandas()
    return _topk_reduce(cands, k, by="dist2", ascending=True)


class IVFIndexStage:
    """IVF-bucketed ANN assignment stage (the scale path for cosine
    top-k): vectors are assigned to the nearest of ``nlist`` coarse
    centroids; queries probe only the ``nprobe`` nearest buckets.

    Centroids are deterministic: a seeded sample of the corpus
    (vec_id % stride == 0) refined with one Lloyd iteration — identical
    on every worker and across runs. Built once per actor.
    """

    def __init__(self, centroids: np.ndarray):
        self.centroids = _unit_rows(centroids)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        mat = _unit_rows(mat)
        bucket = np.argmax(mat @ self.centroids.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))


def build_ivf_centroids(
    embeddings: ray.data.Dataset,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stride: int = 31,
) -> np.ndarray:
    """Deterministic coarse centroids: strided seed sample + one Lloyd
    iteration over the sample (small, driver-side)."""
    import pyarrow.compute as pc

    sample = (
        embeddings.map_batches(
            lambda b: b.filter(
                pa.array(b[id_col].to_numpy(zero_copy_only=False) % stride == 0)
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(id_col)
    )
    mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    mat = _unit_rows(mat)
    cents = mat[:nlist].copy()
    for _ in range(2):  # fixed Lloyd iterations -> deterministic
        cents = _unit_rows(cents)
        assign = np.argmax(mat @ cents.T, axis=1)
        for j in range(nlist):
            sel = mat[assign == j]
            if len(sel):
                cents[j] = sel.mean(axis=0)
    return _unit_rows(cents)


def ann_cosine_ivf(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF ANN: assign once, then per batch only score vectors whose
    bucket is probed by some query. Approximate (recall asserted in
    tests against the brute-force baseline)."""
    import pyarrow.compute as pc

    cents = build_ivf_centroids(embeddings, nlist, vec_col, id_col)
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
    qmat = _unit_rows(qmat)
    qbuckets = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probed = np.zeros((len(qids), nlist), dtype=bool)
    probed[np.arange(len(qids))[:, None], qbuckets] = True

    def stage(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return _EMPTY_COS
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        mat = _unit_rows(mat)
        bucket = np.argmax(mat @ cents.T, axis=1)
        sims = qmat @ mat.T  # same float path as the brute + pruned stages
        sims[~probed[:, bucket]] = -np.inf
        return _emit_cos_topk(sims, qids, ids, k)

    cands = embeddings.map_batches(stage, batch_format="pyarrow")
    return _resolve_topk_distributed(cands, k, by="cos_sim", ascending=False)


# ------------------------------------------------- IVF layout pruning
def ensure_ivf_layout(
    parquet_path: str,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Materialize (once) the IVF-bucketed LAYOUT of an embedding
    table: vectors assigned by an IVFIndexStage actor pool and written
    to parquet PARTITIONED BY BUCKET, so probing can prune the SCAN —
    only probed partitions are read at query time, which is what makes
    IVF pay at 10^12 scale (bucketing that only prunes compute still
    reads every byte). Returns (layout_dir, centroids)."""
    import hashlib
    import os
    from pathlib import Path

    src = Path(parquet_path)
    cache_root = os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")
    key = hashlib.sha256(
        f"{src.resolve()}:{src.stat().st_mtime_ns}:ivf{nlist}:{id_col}:{vec_col}:{_fp()}".encode()
    ).hexdigest()[:16]
    out = Path(cache_root) / key / "ivf_layout"
    cents_file = "_centroids.npy"
    if out.exists():
        return str(out), np.load(out / cents_file)

    ds = rio.read_table(str(src), columns=[id_col, vec_col])
    cents = build_ivf_centroids(ds, nlist, vec_col, id_col)
    assigned = ds.map_batches(
        IVFIndexStage,
        fn_constructor_args=(cents,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def dup_part_col(b: pa.Table) -> pa.Table:
        # keep `bucket` as a data column too (hive partition values are
        # stripped from the files; the query stage needs them per row)
        return b.append_column("pb", b["bucket"])

    tmp = out.parent / f".tmp_{os.getpid()}"
    assigned.map_batches(dup_part_col, batch_format="pyarrow").write_parquet(
        str(tmp), partition_cols=["pb"]
    )
    np.save(tmp / cents_file, cents)
    try:
        tmp.rename(out)
    except OSError:
        if not out.exists():
            raise
        # lost the rename race: drop OUR copy (a full duplicate of the
        # bucket-partitioned corpus would otherwise sit in the cache)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return str(out), cents


def ann_cosine_ivf_pruned(
    parquet_path: str,
    query_ids: list[int],
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF ANN over the bucket-partitioned layout: reads ONLY the
    partitions probed by some query (scan pruning), then scores each
    query against its own probed buckets. nprobe == nlist is provably
    exact (reads everything); smaller nprobe trades recall for I/O.

    The scanned row count is attached as
    ``result.attrs['rows_scanned']`` so tests can assert the pruning
    actually happened (scan < corpus for nprobe < nlist)."""
    import pyarrow.dataset as pds

    layout, cents = ensure_ivf_layout(parquet_path, nlist, id_col, vec_col)

    qset = sorted(int(i) for i in set(query_ids))
    # pushed-down id filter: only the O(|queries|) rows reach the
    # driver — never the corpus (the scan pruning below would be
    # pointless if the query lookup materialized everything)
    import pyarrow.compute as _pc

    qtab = pds.dataset(parquet_path).to_table(
        columns=[id_col, vec_col],
        filter=_pc.field(id_col).isin(qset),
    )
    qids = qtab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(qids)
    qids = qids[order]
    qmat = np.stack(qtab[vec_col].to_numpy(zero_copy_only=False))[order].astype(np.float64)
    qmat = _unit_rows(qmat)
    qbuckets = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]

    probe_union = sorted(int(b) for b in set(qbuckets.ravel()))
    from pathlib import Path as _P

    # read_parquet expands a single directory but not a list of them —
    # enumerate the partition files of every probed bucket explicitly
    paths = [
        str(f)
        for b in probe_union
        for f in sorted(_P(f"{layout}/pb={b}").glob("*.parquet"))
    ]
    scan = rio.read_table(paths, columns=[id_col, vec_col, "bucket"])

    # query x bucket membership LUT: probed[i, b] == query i probes b
    probed = np.zeros((len(qids), nlist), dtype=bool)
    probed[np.arange(len(qids))[:, None], qbuckets] = True

    def stage(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return _EMPTY_COS
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        mat = _unit_rows(mat)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        sims = qmat @ mat.T  # (nq, nb), same float path as the brute stage
        sims[~probed[:, bucket]] = -np.inf  # outside this query's probe set
        return _emit_cos_topk(sims, qids, ids, k)

    rows_scanned = scan.count()
    cands = scan.map_batches(stage, batch_format="pyarrow")
    out = _resolve_topk_distributed(cands, k, by="cos_sim", ascending=False)
    out.attrs["rows_scanned"] = int(rows_scanned)
    return out


# ------------------------------------------- LSH-bucketed cosine ANN
def lsh_hyperplanes(dim: int, n_bits: int, seed: int = 20240115) -> np.ndarray:
    """Deterministic random-hyperplane family: fixed seed, so the same
    (dim, n_bits) yields the same planes on every worker and run."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


class LSHIndexStage:
    """Random-hyperplane LSH bucket assignment for cosine ANN (the
    second scale path beside IVF): bucket = packed sign bits of
    ``v @ planes.T``. Sign is norm-invariant, so no normalization pass
    is needed at index time. Planes built once per actor."""

    def __init__(self, planes: np.ndarray):
        self.planes = planes
        self.weights = (1 << np.arange(planes.shape[0], dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        bits = (mat @ self.planes.T) >= 0.0
        bucket = (bits * self.weights).sum(axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))


def ensure_lsh_layout(
    parquet_path: str,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Materialize (once) the LSH-bucketed LAYOUT of an embedding
    table — same partitioned-parquet shape as ``ensure_ivf_layout``,
    so probing prunes the SCAN, not just the compute. Returns
    (layout_dir, planes)."""
    import hashlib
    import os
    from pathlib import Path

    src = Path(parquet_path)
    cache_root = os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")
    key = hashlib.sha256(
        f"{src.resolve()}:{src.stat().st_mtime_ns}:lsh{n_bits}:{id_col}:{vec_col}:{_fp()}".encode()
    ).hexdigest()[:16]
    out = Path(cache_root) / key / "lsh_layout"
    planes_file = "_planes.npy"
    if out.exists():
        return str(out), np.load(out / planes_file)

    ds = rio.read_table(str(src), columns=[id_col, vec_col])
    first = ds.take(1)[0]
    planes = lsh_hyperplanes(len(first[vec_col]), n_bits)
    assigned = ds.map_batches(
        LSHIndexStage,
        fn_constructor_args=(planes,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def dup_part_col(b: pa.Table) -> pa.Table:
        return b.append_column("pb", b["bucket"])

    tmp = out.parent / f".tmp_{os.getpid()}"
    assigned.map_batches(dup_part_col, batch_format="pyarrow").write_parquet(
        str(tmp), partition_cols=["pb"]
    )
    np.save(tmp / planes_file, planes)
    try:
        tmp.rename(out)
    except OSError:
        if not out.exists():
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # lost race: drop our copy
    return str(out), planes


def ann_cosine_lsh_pruned(
    parquet_path: str,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 4,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """LSH ANN over the bucket-partitioned layout: each query probes
    the ``nprobe`` buckets nearest to its own signature in Hamming
    distance (ties broken by bucket id — deterministic). nprobe ==
    2**n_bits probes every bucket and is provably exact; smaller
    nprobe trades recall for I/O, and only probed partitions are read
    (``result.attrs['rows_scanned']`` lets tests assert the pruning)."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as pds

    n_buckets = 1 << n_bits
    if nprobe is None:
        nprobe = n_buckets
    layout, planes = ensure_lsh_layout(parquet_path, n_bits, id_col, vec_col)

    qset = sorted(int(i) for i in set(query_ids))
    qtab = pds.dataset(parquet_path).to_table(
        columns=[id_col, vec_col],
        filter=_pc.field(id_col).isin(qset),
    )
    qids = qtab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(qids)
    qids = qids[order]
    qmat = np.stack(qtab[vec_col].to_numpy(zero_copy_only=False))[order].astype(np.float64)
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    qbucket = (((qmat @ planes.T) >= 0.0) * weights).sum(axis=1).astype(np.int64)
    qmat = _unit_rows(qmat)

    # Hamming-nearest probe sets (n_buckets is tiny; popcount per pair)
    all_b = np.arange(n_buckets, dtype=np.int64)
    pop = np.array([bin(x).count("1") for x in range(n_buckets)], dtype=np.int64)
    ham = pop[np.bitwise_xor(qbucket[:, None], all_b[None, :])]
    probe_order = np.lexsort((all_b[None, :].repeat(len(qids), 0), ham), axis=1)
    qbuckets = probe_order[:, :nprobe]

    probe_union = sorted(int(b) for b in set(qbuckets.ravel()))
    from pathlib import Path as _P

    paths = [
        str(f)
        for b in probe_union
        for f in sorted(_P(f"{layout}/pb={b}").glob("*.parquet"))
    ]
    scan = rio.read_table(paths, columns=[id_col, vec_col, "bucket"])

    probed = np.zeros((len(qids), n_buckets), dtype=bool)
    probed[np.arange(len(qids))[:, None], qbuckets] = True

    def stage(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return _EMPTY_COS
        mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        mat = _unit_rows(mat)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        sims = qmat @ mat.T
        sims[~probed[:, bucket]] = -np.inf
        return _emit_cos_topk(sims, qids, ids, k)

    rows_scanned = scan.count()
    cands = scan.map_batches(stage, batch_format="pyarrow")
    out = _resolve_topk_distributed(cands, k, by="cos_sim", ascending=False)
    out.attrs["rows_scanned"] = int(rows_scanned)
    return out


# ------------------------------------------------- distributed queries
def knn_queries(
    points: ray.data.Dataset,
    k: int = 3,
    id_col: str = "osm_id",
    query_col: str = "_is_query",
    zoom: int = 6,
    halo: int = 1,
    driver_gate: int | None = None,
) -> pd.DataFrame:
    """EXACT kNN for a FLAGGED SUBSET of the points, fully distributed —
    the scale path when the query set itself grows with the corpus (the
    per-query kernels above take a driver-built Python list, which is
    O(corpus) driver state when queries are e.g. every 17th entity).

    Shape (asymmetric halo join — cheaper than ``knn_all``'s 9x corpus
    replication when queries are a sparse subset):

    1. scatter: every point goes to its OWN grid cell once; every
       flagged query is additionally replicated to its (2*halo+1)^2
       halo cells. Shuffle volume = corpus + queries x (2*halo+1)^2.
    2. groupby(cell): per-cell vectorized distance matrix (queries in
       the cell x candidate points of the cell), emitting each query's
       per-cell top-k candidates by (dist2, neighbor_id). The home cell
       additionally emits one sentinel row per query (neighbor -1,
       dist2 inf) so queries with empty neighborhoods still reach the
       resolve stage.
    3. groupby(query bucket): DISTRIBUTED per-query top-k resolve —
       one lexsort per bucket, running k-th distance vs the guaranteed
       radius (distance from the query point to the edge of its
       explored block; a side that reaches the grid border guards
       infinite — nothing exists beyond the planar world). Strict ``<``
       so boundary ties fall through to the fallback, same rule as
       ``knn_all``.
    4. the rare unresolved queries (sparse neighborhoods) fall back to
       one brute-force broadcast pass — O(stragglers) driver state, by
       construction small when ``zoom`` matches point density.

    Exactness is zoom/halo-independent (the guarantee adapts); zoom
    picks the partitioning granularity, halo trades replication for
    fewer fallbacks. Planar e7 distances, no antimeridian wrap (same
    contract as ``knn_points``).
    """
    from ..model import LAT_MOD, LON_MOD
    from .grid import cell_id

    nx = 1 << zoom
    ny = max(1, 1 << (zoom - 1))
    w = LON_MOD / nx
    h = LAT_MOD / ny
    side = 2 * halo + 1
    nqb = 64  # query-resolve buckets: many queries per group call

    def scatter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch["lon_e7"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = batch["lat_e7"].to_numpy(zero_copy_only=False).astype(np.int64)
        qf = batch[query_col].to_numpy(zero_copy_only=False).astype(bool)
        cells = cell_id(lon, lat, zoom)
        qi = np.flatnonzero(qf)
        reps = np.repeat(qi, side * side)
        off = np.tile(np.arange(side * side), len(qi))
        ox = off % side - halo
        oy = off // side - halo
        tx = (cells % nx)[reps] + ox
        ty = (cells // nx)[reps] + oy
        valid = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
        reps2, tx, ty = reps[valid], tx[valid], ty[valid]
        home = (ox[valid] == 0) & (oy[valid] == 0)
        return pa.table(
            {
                "_tcell": pa.array(np.concatenate([cells, ty * nx + tx])),
                id_col: pa.array(np.concatenate([ids, ids[reps2]])),
                "lon_e7": pa.array(np.concatenate([lon, lon[reps2]])),
                "lat_e7": pa.array(np.concatenate([lat, lat[reps2]])),
                "_q": pa.array(
                    np.concatenate([np.zeros(len(ids), dtype=bool), np.ones(len(reps2), dtype=bool)])
                ),
                "_home": pa.array(
                    np.concatenate([np.zeros(len(ids), dtype=bool), home])
                ),
            }
        )

    _EMPTY_PART = pd.DataFrame(
        {"query_id": pd.Series([], dtype="int64"),
         "neighbor_id": pd.Series([], dtype="int64"),
         "d2": pd.Series([], dtype="float64"),
         "q_lon": pd.Series([], dtype="int64"),
         "q_lat": pd.Series([], dtype="int64"),
         "_qb": pd.Series([], dtype="int64")}
    )

    def cell_partials(g: pd.DataFrame) -> pd.DataFrame:
        qm = g["_q"].to_numpy(dtype=bool)
        ids = g[id_col].to_numpy(dtype=np.int64)
        lon = g["lon_e7"].to_numpy(dtype=np.float64)
        lat = g["lat_e7"].to_numpy(dtype=np.float64)
        ci = np.flatnonzero(qm)
        if len(ci) == 0:
            return _EMPTY_PART
        frames = []
        pi = np.flatnonzero(~qm)
        if len(pi):
            qid = ids[ci]
            dx = lon[ci][:, None] - lon[pi][None, :]
            dy = lat[ci][:, None] - lat[pi][None, :]
            d2 = dx * dx + dy * dy
            d2[ids[pi][None, :] == qid[:, None]] = np.inf  # self-exclusion
            take = min(k, len(pi))
            part = np.argpartition(d2, take - 1, axis=1)[:, :take]
            kth = np.take_along_axis(d2, part, axis=1).max(axis=1)
            sel = (d2 <= kth[:, None]) & np.isfinite(d2)  # tie-inclusive
            qrow, crow = np.nonzero(sel)
            if len(qrow):
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid[qrow],
                            "neighbor_id": ids[pi][crow],
                            "d2": d2[qrow, crow],
                            "q_lon": lon[ci][qrow].astype(np.int64),
                            "q_lat": lat[ci][qrow].astype(np.int64),
                        }
                    )
                )
        hm = np.flatnonzero(qm & g["_home"].to_numpy(dtype=bool))
        if len(hm):  # sentinel: every query surfaces in the resolve stage
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": ids[hm],
                        "neighbor_id": np.full(len(hm), -1, dtype=np.int64),
                        "d2": np.full(len(hm), np.inf),
                        "q_lon": lon[hm].astype(np.int64),
                        "q_lat": lat[hm].astype(np.int64),
                    }
                )
            )
        if not frames:
            return _EMPTY_PART
        out = pd.concat(frames, ignore_index=True)
        out["_qb"] = (out["query_id"].to_numpy() % nqb).astype(np.int64)
        return out

    def resolve_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].to_numpy(dtype=np.int64)
        d2 = g["d2"].to_numpy(dtype=np.float64)
        nid = g["neighbor_id"].to_numpy(dtype=np.int64)
        qlon = g["q_lon"].to_numpy(dtype=np.float64)
        qlat = g["q_lat"].to_numpy(dtype=np.float64)
        o = np.lexsort((nid, d2, qid))
        qid, d2, nid, qlon, qlat = qid[o], d2[o], nid[o], qlon[o], qlat[o]
        starts = np.flatnonzero(np.r_[True, qid[1:] != qid[:-1]])
        cnt = np.diff(np.r_[starts, len(qid)])
        # sentinels (d2=inf) sort last, so they only reach the k-th slot
        # when a query has < k real candidates — which correctly forces
        # kth=inf and the fallback below
        take = np.minimum(cnt, k)
        offset = np.arange(len(qid)) - np.repeat(starts, cnt)
        sel = offset < np.repeat(take, cnt)
        kth = d2[starts + take - 1]
        # guaranteed radius: explored block edges; grid-border sides
        # guard infinite (no planar points beyond the world edge)
        ql, qt = qlon[starts], qlat[starts]
        cx = ((ql.astype(np.int64) + LON_MOD // 2) % LON_MOD) * nx // LON_MOD
        cy = np.minimum((qt.astype(np.int64) + LAT_MOD // 2) * ny // LAT_MOD, ny - 1)
        xlo = np.where(cx - halo >= 0, (cx - halo) * w - LON_MOD / 2, -np.inf)
        xhi = np.where(cx + halo <= nx - 1, (cx + halo + 1) * w - LON_MOD / 2, np.inf)
        ylo = np.where(cy - halo >= 0, (cy - halo) * h - LAT_MOD / 2, -np.inf)
        yhi = np.where(cy + halo <= ny - 1, (cy + halo + 1) * h - LAT_MOD / 2, np.inf)
        guard = np.minimum(np.minimum(ql - xlo, xhi - ql), np.minimum(qt - ylo, yhi - qt))
        guard = np.maximum(guard, 0.0)  # antimeridian cell-index wrap clamp
        resolved = (cnt >= k) & (kth < guard * guard)
        return pd.DataFrame(
            {
                "query_id": qid[sel],
                "neighbor_id": nid[sel],
                "d2": d2[sel],
                "q_lon": qlon[sel].astype(np.int64),
                "q_lat": qlat[sel].astype(np.int64),
                "resolved": np.repeat(resolved, cnt)[sel],
            }
        )

    # adaptive operating point (the combine_partials philosophy: the
    # distributed machinery is for data that NEEDS it). For an input
    # already materialized with a known small row count, both shuffles
    # are pure scheduling overhead (~1 s at sandbox scale for a few
    # thousand rows); run the SAME scatter/cell/resolve kernels in one
    # driver pass instead. The gate is a documented constant — driver
    # memory is bounded by it, never by the corpus — and the
    # distributed path is forced in tests via driver_gate=0
    # (tests/test_spatial.py knn_queries A/Bs run both paths).
    if driver_gate is None:
        driver_gate = 64 * 1024
    from ray.data.dataset import MaterializedDataset

    small = isinstance(points, MaterializedDataset) and points.count() <= driver_gate
    if small:
        scat = scatter(
            pa.Table.from_pandas(points.to_pandas(), preserve_index=False)
        ).to_pandas()
        frames = [
            cell_partials(g.drop(columns=["_tcell"]))
            for _, g in scat.groupby("_tcell", sort=False)
        ]
        pdf = pd.concat(frames, ignore_index=True) if frames else _EMPTY_PART
        res = (
            resolve_bucket(pdf.drop(columns=["_qb"])) if len(pdf) else pd.DataFrame()
        )
    else:
        partials = (
            points.map_batches(scatter, batch_format="pyarrow")
            .groupby("_tcell")
            .map_groups(lambda g: cell_partials(g.drop(columns=["_tcell"])), batch_format="pandas")
            # pin the (tiny, <= queries x (k+ties) x halo-cells rows)
            # partials: the second sort-groupby re-executes a lazy input
            # for boundary sampling, which would re-run every distance
            # matrix — and, transitively, the caller's decode if `points`
            # itself is lazy
            .materialize()
        )
        # second gate: resolve_bucket groups by query_id internally, so
        # it is bucket-layout-independent; partials are materialized, so
        # their size is known — below the gate one pandas pass skips the
        # second shuffle's fixed cost, above it the groupby(_qb)
        # distributed resolve runs.
        if partials.count() <= driver_gate:
            pdf = partials.to_pandas()
            res = (
                resolve_bucket(pdf.drop(columns=["_qb"]))
                if len(pdf)
                else pd.DataFrame()
            )
        else:
            res = (
                partials.groupby("_qb")
                .map_groups(lambda g: resolve_bucket(g.drop(columns=["_qb"])), batch_format="pandas")
                .to_pandas()  # output-sized: <= queries x (k + boundary ties) rows
            )
    if res.empty:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64"),
             "dist2": pd.Series([], dtype="float64")}
        )
    good = res[res["resolved"] & (res["neighbor_id"] >= 0)][["query_id", "neighbor_id", "d2"]]
    unresolved = res[~res["resolved"]][["query_id", "q_lon", "q_lat"]].drop_duplicates("query_id")
    if len(unresolved):
        queries = list(unresolved.itertuples(index=False, name=None))
        brute = knn_points(points, queries, k=k, id_col=id_col)
        good = pd.concat(
            [good, brute.rename(columns={"dist2": "d2"})[["query_id", "neighbor_id", "d2"]]],
            ignore_index=True,
        )
    out = _topk_reduce(good.rename(columns={"d2": "dist2"}), k, by="dist2", ascending=True)
    return out[["query_id", "neighbor_id", "rank", "dist2"]]


# ------------------------------------------------------------ kNN-all
def knn_all(
    points: ray.data.Dataset,
    k: int = 3,
    id_col: str = "osm_id",
    zoom: int = 3,
) -> pd.DataFrame:
    """EXACT k nearest neighbors for EVERY point (kNN-all) — the
    all-pairs workload the per-query kernels cap out on.

    Shape: halo-replicated neighborhood join. Each point is emitted to
    its own grid cell AND its 8 neighbors (9x replication — the halo);
    one groupby(cell) then gives every cell's CORE points all
    candidates within the 3x3 block, and the per-group kNN is one
    vectorized distance matrix. A core point is RESOLVED when its k-th
    candidate distance is within the guaranteed radius (distance to the
    edge of the explored block — everything beyond is provably
    farther); the rare unresolved points (sparse cells) fall back to
    one brute-force pass. Partitioning assumption: a 3x3 block of
    cells fits in one group — pick ``zoom`` so cells hold O(100-10k)
    points; the shuffle volume is 9x the corpus, independent of k.
    """
    from ..model import LAT_MOD, LON_MOD
    from .grid import cell_id

    nx = 1 << zoom
    ny = max(1, 1 << (zoom - 1))
    w = LON_MOD / nx
    h = LAT_MOD / ny

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch["lon_e7"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = batch["lat_e7"].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = cell_id(lon, lat, zoom)
        cx = cells % nx
        cy = cells // nx
        n = len(ids)
        reps = np.repeat(np.arange(n), 9)
        off = np.tile(np.arange(9), n)
        ox = off % 3 - 1
        oy = off // 3 - 1
        tx = cx[reps] + ox
        ty = cy[reps] + oy
        valid = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
        reps, tx, ty, ox, oy = reps[valid], tx[valid], ty[valid], ox[valid], oy[valid]
        return pa.table(
            {
                "_tcell": pa.array(ty * nx + tx),
                id_col: pa.array(ids[reps]),
                "lon_e7": pa.array(lon[reps]),
                "lat_e7": pa.array(lat[reps]),
                "_core": pa.array((ox == 0) & (oy == 0)),
            }
        )

    def group_knn(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(dtype=np.int64)
        lon = g["lon_e7"].to_numpy(dtype=np.float64)
        lat = g["lat_e7"].to_numpy(dtype=np.float64)
        core = g["_core"].to_numpy(dtype=bool)
        ci = np.flatnonzero(core)
        if len(ci) == 0:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "d2": pd.Series([], dtype="float64"),
                 "q_lon": pd.Series([], dtype="int64"),
                 "q_lat": pd.Series([], dtype="int64"),
                 "resolved": pd.Series([], dtype="bool")}
            )
        tcell = int(g["_tcell"].iloc[0])
        cx, cy = tcell % nx, tcell // nx
        # explored block bounds in e7 (edges at the grid border explore
        # to the end of the world -> infinite guard on that side)
        xlo = (cx - 1) * w - LON_MOD / 2 if cx - 1 >= 0 else -np.inf
        xhi = (cx + 2) * w - LON_MOD / 2 if cx + 1 < nx else np.inf
        ylo = (cy - 1) * h - LAT_MOD / 2 if cy - 1 >= 0 else -np.inf
        yhi = (cy + 2) * h - LAT_MOD / 2 if cy + 1 < ny else np.inf

        dx = lon[ci][:, None] - lon[None, :]
        dy = lat[ci][:, None] - lat[None, :]
        d2 = dx * dx + dy * dy
        # exclude by ID equality, not position: knn_points and the
        # sparse-cell brute fallback both id-exclude, so a duplicate-id
        # input must not give path-dependent results
        d2[ids[ci][:, None] == ids[None, :]] = np.inf
        take = min(k, d2.shape[1] - 1)
        # flat accumulation: one DataFrame per GROUP, not per point
        q_parts, n_parts, d_parts, res_flags, n_rows = [], [], [], [], []
        for j, q in enumerate(ci):
            order = np.lexsort((ids, d2[j]))[:take] if take > 0 else np.array([], dtype=int)
            kth = d2[j][order[-1]] if take > 0 and len(order) else np.inf
            guard = max(
                0.0,  # antimeridian wrap can make the raw margin negative
                min(lon[q] - xlo, xhi - lon[q], lat[q] - ylo, yhi - lat[q]),
            )
            # resolved needs a FULL k candidates STRICTLY inside the
            # guarantee: a tied candidate exactly ON the block boundary
            # may be owned by an unexplored cell, so boundary ties fall
            # through to the brute pass; fewer than k found likewise
            resolved = len(order) == k and kth < guard * guard
            if len(order):
                n_parts.append(ids[order])
                d_parts.append(d2[j][order])
                n_rows.append(len(order))
            else:
                n_parts.append(np.array([-1], dtype=np.int64))
                d_parts.append(np.array([np.inf]))
                n_rows.append(1)
            res_flags.append(resolved)
        n_rows = np.asarray(n_rows)
        qv = ids[ci]
        return pd.DataFrame(
            {
                "query_id": np.repeat(qv, n_rows),
                "neighbor_id": np.concatenate(n_parts),
                "d2": np.concatenate(d_parts),
                "q_lon": np.repeat(lon[ci].astype(np.int64), n_rows),
                "q_lat": np.repeat(lat[ci].astype(np.int64), n_rows),
                "resolved": np.repeat(np.asarray(res_flags, dtype=bool), n_rows),
            }
        )

    cand = (
        points.map_batches(replicate, batch_format="pyarrow")
        .groupby("_tcell")
        .map_groups(lambda g: group_knn(g), batch_format="pandas")
        .to_pandas()
    )
    resolved = cand[cand["resolved"] & (cand["neighbor_id"] >= 0)][
        ["query_id", "neighbor_id", "d2"]
    ]
    unresolved = cand[~cand["resolved"]][["query_id", "q_lon", "q_lat"]].drop_duplicates("query_id")
    if len(unresolved):
        # brute-force pass for the sparse-region remainder (rare by
        # construction when zoom matches density)
        queries = list(unresolved.itertuples(index=False, name=None))
        brute = knn_points(points, queries, k=k, id_col=id_col)
        resolved = pd.concat(
            [resolved, brute.rename(columns={"dist2": "d2"})[["query_id", "neighbor_id", "d2"]]],
            ignore_index=True,
        )
    out = _topk_reduce(resolved.rename(columns={"d2": "dist2"}), k, by="dist2", ascending=True)
    return out[["query_id", "neighbor_id", "rank", "dist2"]]
