"""JSONL (newline-delimited JSON) source — the text-log ingest format.

The reference ships multiple wire formats behind one reader surface
(oshdb-etl: PBF and keytable streams); this module adds the log-shaped
text format the same way the osmpbf/pbfish fixtures do: a
code-fingerprinted ``ensure_*`` cache deterministically derives a
sharded JSONL corpus from the sf_dir's events.parquet (integer-clean
columns — epoch-microsecond timestamps and cent values — so the JSON
round-trip is exact by construction, no float re-parse ambiguity),
and ``read_jsonl`` reads it back with the same task-sizing rule as
rayhist.io.read_table (Arrow JSON reader, block count scaled to bytes
and cluster CPUs — never Ray's 200-block floor).

Cache key = source mtime+size + code_fingerprint(this module), per
the CLAUDE.md rule: an edit to the derivation forces a cold rebuild,
never a hand-bumped :vN.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pyarrow as pa
import ray
import ray.data

from .. import io as rio


def _fp() -> str:
    import sys

    return rio.code_fingerprint(sys.modules[__name__])


def ensure_jsonl_events(sf_dir: str) -> str:
    """Build (once) and return the sharded JSONL twin of
    ``{sf_dir}/events.parquet``: columns (event_id, user_id, ts_us,
    event_type, value_c) — all int64 or string, exact round-trip."""
    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    key = hashlib.sha256(
        f"{src.resolve()}:{st.st_mtime_ns}:{st.st_size}:jsonl:{_fp()}".encode()
    ).hexdigest()[:16]
    out = Path(os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")) / key / "jsonl_events"
    shards = out / "shards"  # marker lives OUTSIDE the data dir: the
    # readers must never see _DONE as a data file
    done = out / "_DONE"
    if done.exists():
        return str(shards)
    shards.mkdir(parents=True, exist_ok=True)

    def to_log(b: pa.Table) -> pa.Table:
        from ..ops.relational import cents

        b2 = cents(b, "value", "value_c")  # pinned half-away rounding
        return pa.table(
            {
                "event_id": b2["event_id"].cast(pa.int64()),
                "user_id": b2["user_id"].cast(pa.int64()),
                "ts_us": b2["ts"].cast(pa.int64()),
                "event_type": b2["event_type"],
                "value_c": b2["value_c"],
            }
        )

    ds = rio.read_table(str(src), columns=["event_id", "user_id", "ts", "event_type", "value"])
    ds.map_batches(to_log, batch_format="pyarrow").write_json(str(shards), force_ascii=False)
    done.touch()
    return str(shards)


def read_jsonl(path: str, **kwargs) -> ray.data.Dataset:
    """read_json with the read_table sizing rule (bytes / target block
    size, floored at cluster CPUs) so reads fuse with the first
    map_batches instead of splitting into Ray's 200-block default
    (auto_num_blocks is parquet-only, so the byte count is summed
    here)."""
    if "override_num_blocks" not in kwargs:
        p = Path(path)
        files = [f for f in p.rglob("*") if f.is_file()] if p.is_dir() else [p]
        total = sum(f.stat().st_size for f in files)
        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
            target = ray.data.DataContext.get_current().target_max_block_size or (128 << 20)
        else:
            ncpu = os.cpu_count() or 8
            target = 128 << 20
        kwargs["override_num_blocks"] = max(ncpu, -(-total // target))
    return ray.data.read_json(path, **kwargs)
