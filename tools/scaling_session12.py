"""Scaling pair for the twelfth-session operator family.

Same two-parallelism fresh-process protocol as tools/scaling_graph.py
(headline = bench.py --scaling; ordered/temporal =
scaling_temporal.py; graph = scaling_graph.py), run over the
twelfth-session additions that move real data volume: integer BM25
ranking, integer HITS (broadcast gate FORCED OFF so the measured code
is the distributed message rounds that run above the gate at cluster
scale), A-priori frequent triples, triadic-closure recommendations,
and the vocabulary-Jaccard matrix — all at sf0.1. The floor run
repeats the identical sequence at sf0.001 (the round-latency cost
that does not parallelize). Results recorded in BASELINE.md
("twelfth-session family scaling pair").

    PYTHONPATH=/root/repo python tools/scaling_session12.py
    python tools/scaling_session12.py --level 8       # one child level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_MAIN = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_FLOOR = "/root/testdata/sf0.001"


def _run_ops(sf: str) -> dict:
    import pyarrow as pa

    from rayhist import io as rio
    from rayhist import pipelines as p
    from rayhist.ops.hits import hits_bipartite
    from rayhist.ops.relational import hash_join

    times: dict[str, float] = {}
    t0 = time.perf_counter()
    p.q_bm25_top_docs(sf)
    times["bm25"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    li = rio.read_table(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )
    od = rio.read_table(f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    hits_bipartite(
        hash_join(li, od, on="o_orderkey"),
        src="o_custkey", dst="l_partkey",
        iters=2, broadcast_gate=0,  # force the distributed rounds
    )
    times["hits_distributed"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    tri = p.q_frequent_part_triples(sf)
    times["triples"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    p.q_copurchase_recommendations(sf)
    times["recommendations"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    p.q_source_vocab_jaccard(sf)
    times["vocab_jaccard"] = round(time.perf_counter() - t0, 3)
    return {"times": times, "n_triples": int(len(tri))}


def run_level(ncpu: int) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    floor = _run_ops(SF_FLOOR)  # warms pools AND measures the floor
    main_run = _run_ops(SF_MAIN)
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
        "n_triples": main_run["n_triples"],
    }


def main() -> int:
    if "--level" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--level") + 1])
        print(json.dumps(run_level(ncpu)))
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
                "metric": (
                    f"twelfth-session family scaling ({lo} -> {hi} cpus, "
                    "fresh processes)"
                ),
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                "speedup": round(t_lo / t_hi, 3),
                "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
                f"floor_{lo}": f_lo,
                f"floor_{hi}": f_hi,
                "work_scaling_efficiency": work_eff,
                "per_op_efficiency": per_op,
                f"queries_{lo}": out[lo]["queries"],
                f"queries_{hi}": out[hi]["queries"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
