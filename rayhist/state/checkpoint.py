"""Per-partition checkpointing with lineage + metrics — the resumable
batch-pipeline contract of the north rule.

Design (SURVEY.md §4 "checkpoint / resume" row): a large job is split
into independent input shards (e.g. the parquet fragments of the
span-document table, or cell-id key ranges). Each shard's output is a
separate directory written ATOMICALLY (temp dir + rename), and a
manifest line (JSON) records:

    partition id, input lineage (paths + fingerprints), output row
    count, output checksum, wall time, engine version

On resume, shards whose manifest line exists AND whose output
directory is present are skipped — a re-submitted job re-does only
missing work and the final output is byte-identical (checksums prove
it). The reference has no query-time checkpointing (a failed thread
fails the query); its ETL is resumable only at step granularity
(Transform.java:125-170) — this is strictly stronger and is what a
10^12-document run needs.

Ray-level note: each shard is itself a full Ray Data pipeline (block-
parallel inside); shard granularity only bounds re-done work, it does
not serialize execution.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

ENGINE_VERSION = "rayhist-0.1"


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return hashlib.sha256(f"{path}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:16]


def _table_checksum(tbl: pa.Table) -> str:
    """Order-insensitive content checksum of an Arrow table.

    Deterministic ACROSS processes and runs (the resume contract says
    re-submitted jobs produce byte-identical output and checksums prove
    it): values are hashed with pandas' fixed-key hash, never Python's
    per-process-salted builtin ``hash()``.
    """
    import numpy as np
    import pandas as pd

    cols = sorted(tbl.schema.names)
    row_hashes = None
    for c in cols:
        try:
            vals = tbl[c].cast(pa.string()).to_numpy(zero_copy_only=False)
        except pa.lib.ArrowNotImplementedError:
            # nested columns (list/struct/map) have no utf8 cast —
            # fall back to their Python repr (slow, nested-only) so a
            # checkpointed pipeline keeping e.g. a tags list does not
            # crash AFTER its distributed work finished
            vals = np.array([repr(v) for v in tbl[c].to_pylist()], dtype=object)
        h = pd.util.hash_pandas_object(
            pd.Series(vals, dtype=object), index=False, hash_key=c.ljust(16, "_")[:16]
        ).to_numpy()
        row_hashes = h if row_hashes is None else row_hashes * np.uint64(31) + h
    total = int(row_hashes.sum()) if row_hashes is not None and len(row_hashes) else 0
    return f"{total & ((1 << 64) - 1):016x}"


def _files_stats(paths: list[str]) -> tuple[int, str]:
    """(rows, checksum) over a shard's parquet files WITHOUT
    concatenating them into driver memory: the checksum is a sum of
    per-row hashes, which is additive across files, so it accumulates
    file-by-file (bounded by the largest single file, not the shard)."""
    rows, total = 0, 0
    for f in paths:
        tbl = pq.read_table(f)
        rows += tbl.num_rows
        if tbl.num_rows:
            total = (total + int(_table_checksum(tbl), 16)) & ((1 << 64) - 1)
    return rows, (f"{total:016x}" if rows else "0" * 16)


def _read_manifest(manifest_path: Path) -> dict[str, dict]:
    """Last-line-wins manifest parse, tolerating a torn trailing line
    (SIGKILL / ENOSPC mid-append): an unparseable line is skipped and
    its shard simply gets redone — the resumable log must never be the
    thing that prevents resuming."""
    prior: dict[str, dict] = {}
    if manifest_path.exists():
        for line in manifest_path.read_text().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            prior[rec["partition"]] = rec
    return prior


def run_sharded(
    shards: dict[str, list[str]],
    process: Callable[[list[str]], ray.data.Dataset],
    out_dir: str,
) -> dict:
    """Run ``process(input_paths) -> Dataset`` once per shard with
    per-shard checkpointing.

    shards: {partition_id: [input paths]}. Returns the manifest dict.
    Already-completed shards (manifest entry + output present AND the
    recorded input lineage matching the current inputs) are skipped; a
    shard whose inputs changed since its manifest line was written
    (different files, sizes or mtimes under the same partition id) is
    INVALIDATED and redone — resume is keyed on lineage, not on the
    partition name. Partial outputs (temp dirs) from a killed run are
    ignored and redone.
    """
    import shutil

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = out / "manifest.jsonl"
    prior = _read_manifest(manifest_path)

    def _lost_race(pid: str, tmp: Path, rec: dict) -> dict:
        """A concurrent run published this shard first. Our tmp is
        discarded; describe the SURVIVING content (the winner's
        manifest line if landed, else a re-checksum — a racing run on
        a different engine version may differ from our rec)."""
        shutil.rmtree(tmp, ignore_errors=True)
        winner = _read_manifest(manifest_path).get(pid)
        if winner is None:
            surv = sorted(str(f) for f in (out / pid).glob("*.parquet"))
            rows, csum = _files_stats(surv)
            winner = {**rec, "rows_out": rows, "checksum": csum}
        return {**winner, "lost_race": True}

    done: dict[str, dict] = {}
    for pid, inputs in sorted(shards.items()):
        rec = prior.get(pid)
        try:
            lineage = {p: _fingerprint(p) for p in inputs}
        except FileNotFoundError:
            # an input vanished (e.g. cache GC) after the shard
            # completed: the output + manifest are the only record —
            # serve them ONLY if the recorded lineage covers exactly
            # the CURRENT input set and every still-existing input's
            # fingerprint matches (a remapped shard under the same id
            # must NOT be served from the old output). Without a
            # matching completed output the shard is unservable, so
            # re-raise.
            if (
                rec is not None
                and (out / pid).exists()
                and set(rec.get("lineage", {})) == set(inputs)
                and all(
                    rec["lineage"][p] == _fingerprint(p)
                    for p in inputs
                    if os.path.exists(p)
                )
            ):
                done[pid] = rec
                continue
            raise
        if rec is not None and rec.get("lineage") == lineage and (out / pid).exists():
            done[pid] = rec
            continue
        if (out / pid).exists():  # stale output (lineage changed): redo
            shutil.rmtree(out / pid)
        t0 = time.perf_counter()
        ds = process(inputs)
        tmp = out / f".tmp_{pid}_{os.getpid()}"
        # a stale tmp dir (same-pid retry, or pid reuse after a kill)
        # would MERGE leftover partial files into this run's output —
        # write_parquet appends uniquely-named files, it does not clear
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(str(tmp))
        parts = sorted(str(f) for f in tmp.glob("*.parquet"))
        rows_out, csum = _files_stats(parts)  # file-by-file: no driver concat
        rec = {
            "partition": pid,
            "lineage": lineage,
            "rows_out": rows_out,
            "checksum": csum,
            "wall_s": round(time.perf_counter() - t0, 3),
            "engine": ENGINE_VERSION,
        }
        final = out / pid
        if final.exists():  # lost the rename race to a concurrent run
            done[pid] = _lost_race(pid, tmp, rec)
            continue
        try:
            tmp.rename(final)
        except OSError:
            # TOCTOU: the winner renamed between our exists() check
            # and ours — same lost-race path, not a crash
            if not final.exists():
                raise
            done[pid] = _lost_race(pid, tmp, rec)
            continue
        with open(manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        done[pid] = rec
    return done


# ------------------------------------------------------------------ skew
def salted_count_by(
    ds: ray.data.Dataset,
    keys: list[str],
    salt_col: str,
    n_salt: int = 16,
    alias: str = "n",
):
    """Two-stage aggregation with deterministic salting for skewed
    keys: groupby(keys + salt) partials, then groupby(keys) final —
    a single mega-key (dense urban cell) is spread over ``n_salt``
    reducers. Deterministic (salt = row key mod n) so results and
    resume behavior are identical across runs — the requirement the
    reference meets by shuffling cell order
    (MapReducerIgniteLocalPeek.java:185-233).
    """
    import numpy as np
    from ray.data.aggregate import Count, Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        base = batch[salt_col].to_numpy(zero_copy_only=False)
        return batch.append_column("_salt", pa.array((base % n_salt).astype(np.int64)))

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([*keys, "_salt"])
        .aggregate(Count(alias_name="_pc"))
    )
    return partial.groupby(keys).aggregate(Sum("_pc", alias_name=alias))


def write_partitioned_by_cell(
    ds: ray.data.Dataset,
    out_dir: str,
    zoom: int,
    min_rows_per_cell: int = 100,
) -> dict:
    """The Load-pass analog (load/LoaderNode.java:44-100): write rows
    partitioned by grid cell, COALESCING sparse cells into their parent
    cell (one zoom up) until each output partition has at least
    ``min_rows_per_cell`` rows or reaches zoom 0 — the reference's
    minEntitiesPerCell rule. Output: one directory per (zoom, cell)
    with a manifest (resumable layout).

    Expects a ``cell`` column at ``zoom`` plus lon/lat columns for
    re-assignment on promotion.
    """
    import numpy as np

    counts = ds.groupby("cell").count().to_pandas()
    small = {int(c): int(n) for c, n in zip(counts["cell"], counts["count()"])}

    # decide the final (zoom, cell) for every input cell, driver-side
    # (cheap: one entry per occupied cell, not per row). Ancestor sums
    # are aggregated bottom-up ONCE per zoom level — O(cells * zoom),
    # not O(cells^2) dict scans per promotion step.
    level_counts: dict[int, dict[int, int]] = {zoom: dict(small)}
    for z in range(zoom - 1, -1, -1):
        agg: dict[int, int] = {}
        for c, n in level_counts[z + 1].items():
            parent = _ancestor_cell(c, z + 1, z)
            agg[parent] = agg.get(parent, 0) + n
        level_counts[z] = agg

    final_level: dict[int, tuple[int, int]] = {}
    for c in small:
        z, cc = zoom, c
        while level_counts[z][cc] < min_rows_per_cell and z > 0:
            cc = _ancestor_cell(cc, z, z - 1)
            z -= 1
        final_level[c] = (z, cc)

    # vectorized per-batch mapping: sorted key array + searchsorted
    # fancy-index (every batch cell is in final_level by construction
    # — it came from the groupby over the same dataset); a per-row
    # Python dict lookup here would be the hot Load stage's bottleneck
    keys_arr = np.array(sorted(final_level), dtype=np.int64)
    z_map = np.array([final_level[int(k)][0] for k in keys_arr], dtype=np.int64)
    c_map = np.array([final_level[int(k)][1] for k in keys_arr], dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys_arr, cells)
        batch = batch.append_column("part_zoom", pa.array(z_map[pos]))
        return batch.append_column("part_cell", pa.array(c_map[pos]))

    import shutil

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # atomic REPLACE (temp + rename, the run_sharded discipline): a
    # re-run must never append a second copy of every row into
    # surviving partition dirs, and a reader killed mid-write must
    # never see a half-written layout
    tmp = out / f".tmp_cells_{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    assigned.write_parquet(str(tmp), partition_cols=["part_zoom", "part_cell"])
    manifest = {"zoom": zoom, "partitions": sorted(str(p.relative_to(tmp)) for p in tmp.glob("*/*"))}
    final = out / "cells"
    if final.exists():
        shutil.rmtree(final)
    tmp.rename(final)
    with open(out / "layout.json", "w") as f:
        json.dump(manifest, f)
    return manifest


def _ancestor_cell(cell: int, from_zoom: int, to_zoom: int) -> int:
    c = cell
    for z in range(from_zoom, to_zoom, -1):
        nx_hi = 1 << z
        y, x = divmod(c, nx_hi)
        c = (y // 2) * (1 << (z - 1)) + (x // 2)
    return c
