"""Scaling pair for the ordered/temporal operator family.

The headline --scaling pair (bench.py) measures the snapshot/spatial
job; this tool runs the SAME two-parallelism fresh-process protocol
over the event-log family — as-of join attribution, ROWS rolling
window, time-based RANGE window, sessionization and the
coverage-counting range join — at the round-4 stress scale (10M
events / 150k users, shuffled write order) and reports per-operator
throughput at both levels plus scaling efficiency. Results are
recorded in BASELINE.md ("temporal-family scaling pair").

    PYTHONPATH=/root/repo python tools/scaling_temporal.py          # the 2->8 pair
    RAYHIST_SCALE_LO=4 ... python tools/scaling_temporal.py         # 4->16
    python tools/scaling_temporal.py --level 8                      # one child level

The corpus is generated ONCE (deterministic seed) under the cache dir
and reused; the queries are the oracle-checked pipelines themselves
(rayhist.pipelines q_asof_attribution / q_window_rolling_spikes /
q_time_window_bursts / q_sessions / q_range_error_click_daily), so the
pair measures exactly the code the correctness gate covers.
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

N_EVENTS = int(os.environ.get("RAYHIST_STRESS_EVENTS", str(10_000_000)))
N_USERS = 150_000
QUERIES = [
    "asof_attribution",
    "window_rolling_spikes",
    "time_window_bursts",
    "sessions",
    "range_error_click_daily",
]


def ensure_stress_events() -> str:
    """Deterministic 10M-row event log with the testdata schema
    (event_id, ts[us], user_id, event_type, value, props), timestamps
    inside the pipelines' 2024-01 query window, SHUFFLED write order
    (no free pre-sort for the bucket kernels)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")) / (
        f"stress_events_{N_EVENTS}"
    )
    f = out / "events.parquet"
    if f.exists():
        return str(out)
    rng = np.random.default_rng(20240101)
    t0 = np.datetime64("2024-01-01T06:00:00", "us").astype(np.int64)
    span = 29 * 24 * 3600 * 1_000_000
    ts = t0 + rng.integers(0, span, N_EVENTS)
    users = rng.integers(0, N_USERS, N_EVENTS)
    cats = pa.array(["click", "view", "purchase", "error", "signup"])
    # click/purchase heavy so the as-of and range joins see the r4 mix
    etype_idx = rng.choice(5, N_EVENTS, p=[0.35, 0.25, 0.2, 0.15, 0.05]).astype(np.int32)
    order = rng.permutation(N_EVENTS)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)[order]),
            "ts": pa.array(ts[order]).cast(pa.timestamp("us")),
            "user_id": pa.array(users[order]),
            "event_type": pa.DictionaryArray.from_arrays(
                pa.array(etype_idx[order]), cats
            ).cast(pa.string()),
            "value": pa.array(
                np.round(rng.gamma(2.0, 25.0, N_EVENTS), 2)[order]
            ),
            "props": pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(N_EVENTS, dtype=np.int32)), pa.array([""])
            ).cast(pa.string()),
        }
    )
    tmp = out.parent / f".tmp_stress_{os.getpid()}"
    tmp.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, tmp / "events.parquet", row_group_size=1 << 20)
    try:
        tmp.rename(out)
    except OSError:
        if not f.exists():
            raise
    return str(out)


def run_level(ncpu: int, sf_dir: str) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from rayhist import pipelines as p

    fns = {q: getattr(p, "q_" + q) for q in QUERIES}
    fns["sessions"](sf_dir)  # untimed pool warmup (cheapest family member)
    passes = int(os.environ.get("RAYHIST_BENCH_PASSES", "2"))
    times: dict[str, float] = {}
    for q, fn in fns.items():
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            fn(sf_dir)
            best = min(best, time.perf_counter() - t0)
        times[q] = round(best, 3)
    ray.shutdown()
    total = round(sum(times.values()), 3)
    return {
        "num_cpus": ncpu,
        "value": total,
        "queries": times,
        "events": N_EVENTS,
        "events_per_sec_total": round(len(times) * N_EVENTS / total, 1),
        "passes": passes,
    }


def main() -> int:
    sf_dir = ensure_stress_events()
    if "--level" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--level") + 1])
        print(json.dumps(run_level(ncpu, sf_dir)))
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
    per_op = {
        q: round((out[lo]["queries"][q] / out[hi]["queries"][q]) / (hi / lo), 3)
        for q in out[lo]["queries"]
    }
    print(
        json.dumps(
            {
                "metric": f"temporal-family scaling ({lo} -> {hi} cpus, fresh processes)",
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                "speedup": round(t_lo / t_hi, 3),
                "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
                "per_operator_efficiency": per_op,
                "events": N_EVENTS,
                f"queries_{lo}": out[lo]["queries"],
                f"queries_{hi}": out[hi]["queries"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
