"""Storage gate: Lance when available, Parquet otherwise.

The production design stores the document table in Lance (column/
fragment pruning replaces the reference's SQL ``BETWEEN`` on cell id,
``oshdb-api/.../backend/MapReducerJdbc.java:51-114``). The sandbox has
no ``lance`` package, so everything falls back to partitioned Parquet
with the same layout; all call sites go through these two functions so
the swap is transparent.
"""

from __future__ import annotations

import ray.data

try:  # pragma: no cover - lance not present in the sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, **kwargs) -> ray.data.Dataset:
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return ray.data.read_lance(path, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
