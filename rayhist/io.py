"""Storage gate: Lance when available, Parquet otherwise.

The production design stores the document table in Lance (column/
fragment pruning replaces the reference's SQL ``BETWEEN`` on cell id,
``oshdb-api/.../backend/MapReducerJdbc.java:51-114``). The sandbox has
no ``lance`` package, so everything falls back to partitioned Parquet
with the same layout; all call sites go through these two functions so
the swap is transparent.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import os
import time
from pathlib import Path

import ray
import ray.data

try:  # pragma: no cover - lance not present in the sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


_IMPORT_TIME_NS = time.time_ns()


@functools.lru_cache(maxsize=None)
def code_fingerprint(*modules) -> str:
    """12-hex digest of the given modules' SOURCE BYTES — the version
    suffix of every ``ensure_*`` fixture-cache key.

    A hand-bumped ``:v1`` string only invalidates the cache when a
    human remembers to bump it; a mid-round edit to the derivation or
    encoder then silently serves stale bytes to whoever holds the old
    cache (the round-4 ``osmpbf_relation_member_sums`` hash-mismatch
    hazard). Hashing the generating module's source makes the key a
    pure function of the code: any edit — even one that did not need a
    rebuild — forces a cold rebuild, which is the safe direction.
    Per-process ``lru_cache``: a source edit mid-process is invisible,
    matching Python's own already-imported-module semantics.

    LOUD-FAIL GUARD: the hash reads the file from DISK, but the
    process executes what it IMPORTED. A file edited after import but
    before this first call would key OLD-code output under the
    NEW-code fingerprint — the exact stale-serve direction the
    mechanism exists to kill — so a source file younger than this
    process's rayhist import raises instead of poisoning the cache.
    """
    h = hashlib.sha256()
    for m in modules:
        src = Path(inspect.getfile(m))
        if src.stat().st_mtime_ns > _IMPORT_TIME_NS:
            raise RuntimeError(
                f"code_fingerprint: {src} was modified after this process "
                "imported rayhist — the in-memory module may not match the "
                "on-disk source; restart the process before building fixtures"
            )
        h.update(src.read_bytes())
    return h.hexdigest()[:12]


def _local_parquet_stats(path) -> tuple[int, int] | None:
    """(file count, total bytes) for local parquet paths, else None."""
    paths = list(path) if isinstance(path, (list, tuple)) else [path]
    n_files, total = 0, 0
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    if f.endswith(".parquet"):
                        n_files += 1
                        total += os.path.getsize(os.path.join(root, f))
        elif os.path.isfile(p):
            n_files += 1
            total += os.path.getsize(p)
        else:  # remote / missing: let Ray's own heuristic decide
            return None
    return (n_files, total) if n_files else None


def shuffle_buckets(*paths) -> int | None:
    """Bytes-aware shuffle-bucket count for a join/groupby whose
    inputs are local files the caller can stat: one bucket per ~MB of
    input, floored at 8, capped at the cluster-scaled default
    (cores x 4). The operators' own default (``max(64, cores x 4)``)
    is the right blind choice — per-bucket memory must not grow with
    the corpus — but when the input is measurably tiny, 128 shuffle
    groups for a few thousand rows is pure task-scheduling overhead
    (measured ~2x on the sf0.01 join queries). Returns None for
    remote/missing paths (caller keeps the operator default)."""
    total = 0
    for p in paths:
        st = _local_parquet_stats(p)
        if st is None:
            return None
        total += st[1]
    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
    else:
        ncpu = os.cpu_count() or 8
    return max(8, min(4 * ncpu, -(-total // (1 << 20))))


def auto_num_blocks(path) -> int | None:
    """Read-task count: one per target-size chunk of input, never fewer
    than the cluster's CPUs.

    Ray Data's default parallelism heuristic carries a 200-block
    minimum (``read_op_min_num_blocks``) sized for large clusters; on a
    modest table it splits every file 4x (``SplitBlocks``), breaking
    read->map fusion and paying ~200 task round-trips per downstream
    stage. Measured at sf0.1 rep=64 (64 files / 320 MB / 32 cpus):
    trivial read+count 1.02s -> 0.19s, fused temporal query
    3.9s -> 1.5s. At cluster scale ``total/target_max_block_size``
    dominates and the policy converges to Ray's own sizing minus the
    200-block floor.
    """
    stats = _local_parquet_stats(path)
    if stats is None:
        return None
    _n_files, total = stats
    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
        target = ray.data.DataContext.get_current().target_max_block_size or (128 << 20)
    else:
        # read_parquet would auto-init right after this returns, so
        # bailing out here hands the FIRST read of an un-initialized
        # process to Ray's 200-block floor (the documented, silent
        # 3-5x regression); auto-init uses all cores, so cpu_count is
        # the correct sizing either way
        ncpu = os.cpu_count() or 8
        target = 128 << 20
    return max(ncpu, -(-total // target))


def _is_lance(path) -> bool:
    """True when EVERY given path names a Lance table (str or Path, a
    single path or a list — the same shapes read_table accepts for
    parquet)."""
    paths = list(path) if isinstance(path, (list, tuple)) else [path]
    return bool(paths) and all(str(p).endswith(".lance") for p in paths)


def read_table(path, **kwargs) -> ray.data.Dataset:
    if HAVE_LANCE and _is_lance(path):  # pragma: no cover
        return ray.data.read_lance(path, **kwargs)
    if "override_num_blocks" not in kwargs:
        blocks = auto_num_blocks(path)
        if blocks is not None:
            kwargs["override_num_blocks"] = blocks
    return ray.data.read_parquet(path, **kwargs)


def write_table(ds: ray.data.Dataset, path, **kwargs) -> None:
    if HAVE_LANCE and _is_lance(path):  # pragma: no cover
        ds.write_lance(str(path), **kwargs)
        return
    ds.write_parquet(str(path), **kwargs)
