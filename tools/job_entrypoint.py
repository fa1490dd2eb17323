"""Ray Jobs entrypoint — how this engine runs on a real cluster.

On a fixed-size cluster (the north rule's N / 4N nodes):

    ray job submit --address http://<head>:8265 \
        --working-dir /root/repo \
        -- python tools/job_entrypoint.py \
               --sf-dir /data/sf1 --queries snapshot_count_daily,contrib_daily \
               --out /data/results

Inside a Ray Job the runtime provides the cluster address, so this
script only calls ``ray.init()`` when no session exists (the library
itself never does — CLAUDE.md hard rule). In the sandbox the same
script runs standalone against the local session:

    PYTHONPATH=/root/repo python tools/job_entrypoint.py --sf-dir /root/testdata/sf0.01

Each query's result is written as parquet under ``--out`` (one
directory per query — the resumable-output convention) together with a
manifest line carrying rows, wall time and the engine's git rev; a
re-run skips queries whose manifest entry already matches (the
per-partition checkpoint layer below this, state/checkpoint.py,
handles intra-query resume).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default="", help="comma list; empty = all")
    ap.add_argument("--out", default="/tmp/rayhist_job_out")
    ap.add_argument("--force", action="store_true", help="ignore existing manifest entries")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # standalone run; Ray Jobs pre-init
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    import __ray_entry__ as entrypoint

    all_queries = entrypoint.queries()
    names = [n for n in args.queries.split(",") if n] or list(all_queries)
    unknown = [n for n in names if n not in all_queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = out / "manifest.jsonl"
    done = {}
    if manifest_path.exists() and not args.force:
        for line in manifest_path.read_text().splitlines():
            rec = json.loads(line)
            done[rec["query"]] = rec
    try:
        rev = subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        rev = "unknown"

    ran, skipped = 0, 0
    with open(manifest_path, "a") as mf:
        for name in names:
            prev = done.get(name)
            if prev and prev.get("sf_dir") == args.sf_dir and prev.get("rev") == rev:
                skipped += 1
                continue
            t0 = time.time()
            df = all_queries[name](args.sf_dir)
            qdir = out / name
            qdir.mkdir(exist_ok=True)
            import pandas as pd

            pd.DataFrame(df).to_parquet(qdir / "result.parquet", index=False)
            rec = {
                "query": name,
                "sf_dir": args.sf_dir,
                "rows": int(len(df)),
                "wall_s": round(time.time() - t0, 3),
                "rev": rev,
                "ts": time.time(),
            }
            mf.write(json.dumps(rec) + "\n")
            mf.flush()
            ran += 1
            print(f"done {name}: {rec['rows']} rows in {rec['wall_s']}s")
    print(json.dumps({"ran": ran, "skipped": skipped, "out": str(out)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
