"""Hive-partitioned parquet sink + partition-pruned reader.

The resumable-output story made concrete: ``ensure_partitioned_events``
writes the event log as ``day=N/`` hive directories (one partition per
day — the unit a failed 100-TB run skips on retry, and the unit a
time-ranged query prunes at the READ, never scanning the other 96% of
the corpus). ``read_partition_days`` then reads ONLY the requested
day directories — pruning by directory selection, not by post-read
filter. The ``day`` key is ALSO carried as a regular column inside the
files, so a pruned read returns complete rows without re-deriving the
partition value from the path.

Cache key = source mtime+size + code_fingerprint(this module), the
CLAUDE.md rule (no hand-bumped :vN); the completion marker lives
OUTSIDE the partition tree so readers never see ``_DONE`` as data.

Reference parity: the reference's Load step writes per-cell tables
(oshdb-tool ETL; TableNames.java) — per-key directories are the same
idea with the time axis as the key.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pyarrow as pa
import ray.data

from .. import io as rio


def _fp() -> str:
    import sys

    return rio.code_fingerprint(sys.modules[__name__])


def ensure_partitioned_events(sf_dir: str, t0: int, day_us: int) -> str:
    """Build (once) and return the hive-partitioned (by whole day)
    parquet twin of ``{sf_dir}/events.parquet``: columns (event_id,
    user_id, ts_us, event_type, value_c, day) — all int64 or string,
    exact round-trip. The hive key is written as a DUPLICATE column
    ``day_k`` (partition writes strip their key from the data files;
    the in-file ``day`` copy keeps pruned reads self-contained)."""
    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    key = hashlib.sha256(
        f"{src.resolve()}:{st.st_mtime_ns}:{st.st_size}:hivepart:{_fp()}".encode()
    ).hexdigest()[:16]
    out = Path(os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")) / key / "hive_events"
    parts = out / "parts"
    done = out / "_DONE"
    if done.exists():
        return str(parts)
    # build into a FRESH staging dir and publish with one atomic
    # rename (the arrowipc convention): partitions from a crashed
    # partial build must never union with a rebuild's — stale shards
    # would survive as silent duplicate rows under the same day dirs
    import shutil

    staging = out / f".building-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    staging.mkdir(parents=True, exist_ok=True)

    def derive(b: pa.Table) -> pa.Table:
        from ..ops.relational import cents

        b2 = cents(b, "value", "value_c")  # pinned half-away rounding
        ts = b2["ts"].cast(pa.int64())
        import pyarrow.compute as pc

        day = pc.divide(pc.subtract(ts, t0), day_us)
        return pa.table(
            {
                "event_id": b2["event_id"].cast(pa.int64()),
                "user_id": b2["user_id"].cast(pa.int64()),
                "ts_us": ts,
                "event_type": b2["event_type"],
                "value_c": b2["value_c"],
                "day": day,
                "day_k": day,
            }
        )

    ds = rio.read_table(
        str(src), columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    ds.map_batches(derive, batch_format="pyarrow").write_parquet(
        str(staging), partition_cols=["day_k"]
    )
    shutil.rmtree(parts, ignore_errors=True)
    staging.rename(parts)
    done.touch()
    return str(parts)


def read_partition_days(root: str, days: list[int]) -> ray.data.Dataset:
    """Partition-pruned read: ONLY the ``day=N`` directories named in
    ``days`` are opened (missing partitions raise loudly — a silent
    skip would undercount). The hive key column is re-selected from
    the in-file copy, so rows come back complete."""
    dirs = []
    for d in sorted(set(int(x) for x in days)):
        p = Path(root) / f"day_k={d}"
        if not p.is_dir():
            raise FileNotFoundError(
                f"read_partition_days: partition day_k={d} missing under {root}"
            )
        dirs.append(str(p))
    files = [str(f) for d in dirs for f in sorted(Path(d).rglob("*.parquet"))]
    if not files:
        raise FileNotFoundError(f"read_partition_days: no parquet under {dirs}")
    # rio.read_table owns the read-task sizing (auto_num_blocks takes
    # file lists) — never a bare ray.data.read_parquet (CLAUDE.md)
    return rio.read_table(files)
