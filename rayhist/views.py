"""The two OSHDB views as Ray Data pipelines.

``snapshot_view`` = ``OSMEntitySnapshotView`` (oshdb-api/.../OSMEntitySnapshotView.java)
``contribution_view`` = ``OSMContributionView``

Both are a SINGLE fused ``map_batches`` stage over the span-document
table: decode (span parse) + temporal interpolation happen in one
callable so that a document's versions can never be split across batch
boundaries by re-batching. No shuffle is needed for the views
themselves — each input row is a complete history (the reference
reaches the same property by denormalizing member histories into each
OSH entity at import time, documentation/manual/data-model.md:20-22);
the shuffle comes afterwards, in the groupby(cell, timestamp)
aggregation (see rayhist.aggregate).

Stages are plain functions (stateless tasks). Stages that need
compiled state (boundary-polygon indexes, grid tables) live in
rayhist.spatial as callable classes run as actor pools.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .model import decode_spans
from .temporal import TagFilter, contributions, snapshots


def _match_mask(decoded: pa.Table, tag_filter: TagFilter | None) -> np.ndarray | None:
    return None if tag_filter is None else tag_filter.mask(decoded)


def snapshot_view(
    docs: ray.data.Dataset,
    timestamps,
    tag_filter: TagFilter | None = None,
) -> ray.data.Dataset:
    """Dataset of entity snapshots at the given query timestamps.

    One output row per (entity, timestamp) where the entity exists,
    is visible, and matches the filter — semantics of
    ``CellIterator.iterateByTimestamps`` (CellIterator.java:181-347).
    """
    ts = np.asarray(list(timestamps), dtype=np.int64)

    def stage(batch: pa.Table) -> pa.Table:
        decoded = decode_spans(batch)
        return snapshots(decoded, ts, _match_mask(decoded, tag_filter))

    return docs.map_batches(stage, batch_format="pyarrow")


def contribution_view(
    docs: ray.data.Dataset,
    t_from: int,
    t_to: int,
    tag_filter: TagFilter | None = None,
) -> ray.data.Dataset:
    """Dataset of classified contributions in [t_from, t_to) —
    semantics of ``CellIterator.iterateByContribution``
    (CellIterator.java:437-712)."""

    def stage(batch: pa.Table) -> pa.Table:
        decoded = decode_spans(batch)
        return contributions(
            decoded, int(t_from), int(t_to), _match_mask(decoded, tag_filter)
        )

    return docs.map_batches(stage, batch_format="pyarrow")
