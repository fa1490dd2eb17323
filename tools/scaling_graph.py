"""Scaling pair for the graph operator family.

The headline --scaling pair (bench.py) measures the snapshot/spatial
job and tools/scaling_temporal.py the ordered/temporal family; this
tool runs the same two-parallelism fresh-process protocol over the
GRAPH family — exact triangle counting, integer PageRank, k-core
peeling and bounded-hop BFS — with every size gate FORCED OFF
(broadcast_gate=0), so the measured code is the distributed
message-round / wedge-join shape that runs above the gates at cluster
scale. Results are recorded in BASELINE.md ("graph-family scaling
pair").

    PYTHONPATH=/root/repo python tools/scaling_graph.py            # the 2->8 pair
    python tools/scaling_graph.py --level 8                        # one child level

The stress graph is deterministic (fmix-hashed endpoints, no RNG
state), ~6M distinct edges over 600k nodes (avg degree ~20 — wedge
volume stays linear-ish so the triangle join is CPU-bound, not a
blow-up), generated once under the cache dir and reused.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_EDGES = int(os.environ.get("RAYHIST_STRESS_EDGES", str(6_000_000)))
N_NODES = int(os.environ.get("RAYHIST_STRESS_NODES", str(600_000)))
KCORE_K = 18
BFS_HOPS = 2


def ensure_stress_graph() -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")) / (
        f"stress_graph_{N_EDGES}_{N_NODES}"
    )
    f = out / "edges.parquet"
    if f.exists():
        return str(f)

    def fmix(x: np.ndarray) -> np.ndarray:
        h = x.astype(np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
        return h

    i = np.arange(N_EDGES, dtype=np.uint64)
    u = (fmix(i) % np.uint64(N_NODES)).astype(np.int64)
    v = (fmix(i + np.uint64(0x9E3779B9)) % np.uint64(N_NODES)).astype(np.int64)
    tmp = out.parent / f".tmp_graph_{os.getpid()}"
    tmp.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table({"src": u, "dst": v}), tmp / "edges.parquet", row_group_size=1 << 20
    )
    try:
        tmp.rename(out)
    except OSError:
        if not f.exists():
            raise
    return str(f)


def _run_ops(edge_path: str, kcore_k: int) -> dict:
    """Time the four distributed ops over one edge file."""
    from rayhist import io as rio
    from rayhist.ops.bfs import bfs_hops
    from rayhist.ops.kcore import k_core
    from rayhist.ops.pagerank import pagerank_int
    from rayhist.ops.triangles import dedupe_edges, triangle_count

    def edges():
        raw = rio.read_table(edge_path)
        return dedupe_edges(raw, "src", "dst").map_batches(
            lambda b: b.rename_columns(["src", "dst"]), batch_format="pyarrow"
        )

    times: dict[str, float] = {}
    t0 = time.perf_counter()
    n_edges, n_tri = triangle_count(edges(), broadcast_gate=0)
    times["triangles"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    pagerank_int(edges(), iters=2).to_pandas()
    times["pagerank_2it"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _core, k_rounds = k_core(edges(), kcore_k, broadcast_gate=0)
    times["kcore"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    bfs_hops(edges(), lambda n: n % 1000 == 0, BFS_HOPS, broadcast_gate=0)
    times["bfs"] = round(time.perf_counter() - t0, 3)
    from rayhist.ops.triangles import edge_triangle_support

    t0 = time.perf_counter()
    # distributed credit-groupby + partitioned left join (gate off);
    # consume via count() so the |E|-row result never concatenates
    edge_triangle_support(edges(), broadcast_gate=0).count()
    times["edge_support"] = round(time.perf_counter() - t0, 3)
    return {
        "times": times,
        "n_edges": int(n_edges),
        "n_tri": int(n_tri),
        "k_rounds": int(k_rounds),
    }


def ensure_floor_graph() -> str:
    """Tiny graph (2k edges): running the identical op sequence over it
    measures the ROUND-LATENCY FLOOR — the per-shuffle fixed cost that
    does not parallelize (bench.py's pipeline_floor methodology applied
    to the iterative family)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")) / "floor_graph_2k"
    f = out / "edges.parquet"
    if f.exists():
        return str(f)
    i = np.arange(2000, dtype=np.int64)
    tmp = out.parent / f".tmp_fg_{os.getpid()}"
    tmp.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table({"src": i % 97, "dst": (i * 7 + 1) % 97}), tmp / "edges.parquet"
    )
    try:
        tmp.rename(out)
    except OSError:
        if not f.exists():
            raise
    return str(f)


def run_level(ncpu: int, edge_path: str) -> dict:
    import pyarrow as pa
    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    floor = _run_ops(ensure_floor_graph(), 3)  # warms pools AND measures the floor
    main_run = _run_ops(edge_path, KCORE_K)
    ray.shutdown()
    times = main_run["times"]
    total = round(sum(times.values()), 3)
    floor_total = round(sum(floor["times"].values()), 3)
    return {
        "num_cpus": ncpu,
        "value": total,
        "queries": times,
        "floor": floor_total,
        "floors": floor["times"],
        "edges": main_run["n_edges"],
        "triangles": main_run["n_tri"],
        "kcore_rounds": main_run["k_rounds"],
        "edges_per_sec_total": round(len(times) * main_run["n_edges"] / total, 1),
    }


def main() -> int:
    edge_path = ensure_stress_graph()
    if "--level" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--level") + 1])
        print(json.dumps(run_level(ncpu, edge_path)))
        return 0
    lo = int(os.environ.get("RAYHIST_SCALE_LO", "2"))
    hi = lo * 4
    out = {}
    for ncpu in (lo, hi):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--level", str(ncpu)],
            capture_output=True,
            text=True,
            check=True,
            cwd=_REPO,
            env=dict(os.environ, PYTHONPATH=_REPO),
        )
        out[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
    t_lo, t_hi = out[lo]["value"], out[hi]["value"]
    f_lo, f_hi = out[lo]["floor"], out[hi]["floor"]
    per_op = {
        q: round((out[lo]["queries"][q] / out[hi]["queries"][q]) / (hi / lo), 3)
        for q in out[lo]["queries"]
    }
    work_eff = round(((t_lo - f_lo) / max(t_hi - f_hi, 1e-9)) / (hi / lo), 3)
    print(
        json.dumps(
            {
                "metric": f"graph-family scaling ({lo} -> {hi} cpus, fresh processes)",
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                "speedup": round(t_lo / t_hi, 3),
                "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
                f"floor_{lo}": f_lo,
                f"floor_{hi}": f_hi,
                "work_scaling_efficiency": work_eff,
                "per_op_efficiency": per_op,
                "edges": out[lo]["edges"],
                "triangles": out[lo]["triangles"],
                f"queries_{lo}": out[lo]["queries"],
                f"queries_{hi}": out[hi]["queries"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
