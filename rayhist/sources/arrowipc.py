"""Arrow IPC (Feather v2 / RecordBatch file) source — the binary
columnar interchange format.

Third wire format behind the one reader surface (after the PBF family
and the JSONL/CSV text logs; the reference ships multiple formats
behind oshdb-etl the same way): a code-fingerprinted ``ensure_*``
cache derives a sharded ``.arrow`` twin of the sf_dir's
events.parquet (integer-clean columns, exact round-trip by
construction — IPC is Arrow's own memory layout, so there is no parse
ambiguity at all), and ``read_arrow_ipc`` streams it back as one
Dataset: ``read_binary_files`` (one shard per block) + an in-pipeline
decode ``map_batches`` that fuses with the consumer.

Each shard is written atomically (tmp + os.replace) and named by the
sha256 of its serialized bytes — content-addressed, so a torn write
can never alias a finished shard. The completion marker lives OUTSIDE
the shard dir (the jsonl/csvlog rule: readers must never see _DONE as
a data file).
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


def ensure_arrow_events(sf_dir: str) -> str:
    """Build (once) and return the sharded Arrow-IPC twin of
    ``{sf_dir}/events.parquet``: columns (event_id, user_id, ts_us,
    event_type, value_c), one ``.arrow`` file per input block."""
    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    key = hashlib.sha256(
        f"{src.resolve()}:{st.st_mtime_ns}:{st.st_size}:arrowipc:{_fp()}".encode()
    ).hexdigest()[:16]
    out = Path(os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")) / key / "arrow_events"
    shards = out / "shards"
    done = out / "_DONE"
    if done.exists():
        return str(shards)
    # build into a FRESH staging dir and publish with one atomic
    # rename: shards from a crashed partial build (no _DONE) must
    # never union with a rebuild's — a rerun under a different block
    # slicing writes different content hashes, so stale shards would
    # survive as silent duplicate data
    import shutil

    staging = out / f".building-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    staging.mkdir(parents=True, exist_ok=True)

    def write_shard(b: pa.Table) -> pa.Table:
        from ..ops.relational import cents

        b2 = cents(b, "value", "value_c")  # pinned half-away rounding
        t = pa.table(
            {
                "event_id": b2["event_id"].cast(pa.int64()),
                "user_id": b2["user_id"].cast(pa.int64()),
                "ts_us": b2["ts"].cast(pa.int64()),
                "event_type": b2["event_type"],
                "value_c": b2["value_c"],
            }
        )
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, t.schema) as w:
            w.write_table(t)
        buf = sink.getvalue().to_pybytes()
        name = hashlib.sha256(buf).hexdigest()[:24]
        tmp = staging / f".tmp-{name}"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, staging / f"part-{name}.arrow")
        return pa.table({"rows": pa.array([len(t)], pa.int64())})

    ds = rio.read_table(
        str(src), columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    n = sum(
        r["rows"]
        for r in ds.map_batches(write_shard, batch_format="pyarrow").take_all()
    )
    if n != ds.count():
        raise RuntimeError(f"arrow ipc fixture wrote {n} rows, expected {ds.count()}")
    shutil.rmtree(shards, ignore_errors=True)  # crashed earlier build
    os.replace(staging, shards)
    done.touch()
    return str(shards)


def _decode(b: pa.Table) -> pa.Table:
    """Binary-file block -> decoded Arrow table(s). Runs inside the
    consumer pipeline (fuses with the next map_batches); one IPC file
    per input row."""
    tables = [
        pa.ipc.open_file(pa.BufferReader(raw)).read_all()
        for raw in b["bytes"].to_pylist()
    ]
    return pa.concat_tables(tables) if tables else pa.table({})


def read_arrow_ipc(path: str) -> ray.data.Dataset:
    """Dataset over a sharded ``.arrow`` directory: one binary block
    per shard file + in-pipeline IPC decode. Shard count was fixed at
    fixture build (>= cluster CPUs), so the read parallelizes without
    Ray's 200-block splitting."""
    files = ray.data.read_binary_files(path, file_extensions=["arrow"])
    return files.map_batches(_decode, batch_format="pyarrow")
