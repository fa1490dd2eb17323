"""Ingest: deterministic synthesis of the span-document table.

The reference ingests ``.osh.pbf`` via a 3-pass ETL (extract /
transform / load, ``oshdb-tool/etl/.../transform/Transform.java:57-92``)
that groups version records by entity id and packs per-entity
histories. This sandbox has no external OSM data, so the entity
histories are DERIVED DETERMINISTICALLY from the driver-provided
``events.parquet`` table (TESTDATA.md) with pure integer arithmetic —
the exact same derivation is expressible in ANSI SQL, which is what
makes the DuckDB oracles in ``__ray_entry__.py`` possible.

Derivation (one 'node' document per ``user_id``; all integer-exact):

    versions   = events of the user ordered by (ts, event_id); v = 1..n
    ts         = epoch microseconds of the event (int64)
    visible    = event_type != 'error'          (tombstone convention;
                 reference: version<=0 means deleted, OSMEntity.java:25)
    cs         = user_id * 1_000_000 + (v-1) // 3   (3 consecutive
                 versions share a changeset -> exercises the changeset
                 collapse of OSHEntities.getChangesetTimestamps)
    uid        = round(value * 100) % 37            (contributor id)
    tags       = etype={event_type}, k={props.k}    (sorted by key)
    gv         = (v+1) // 2    (coords change only every 2nd version ->
                 mixes GEOMETRY_CHANGE with pure TAG_CHANGE contribs)
    lon_e7     = (user_id*7919 + gv*104729 + kk*31) % 3_600_000_000
                   - 1_800_000_000
    lat_e7     = (user_id*15_485_863 + gv*32_452_843 + kk*37)
                   % 1_800_000_000 - 900_000_000

The ingest pipeline itself is the Ray-Data analog of the reference's
Transform pass: ``read -> map_batches(derive, vectorized) ->
groupby(osm_id).map_groups(pack spans)`` — the groupby is the one
ingest shuffle (reference: sort-by-id merge, ``Transformer.java:139-260``).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from . import io as rio
from .model import DOCUMENTS_SCHEMA, LAT_MOD, LON_MOD

CACHE_ROOT = os.environ.get("RAYHIST_CACHE", "/tmp/rayhist_cache")


def derive_version_columns(batch: pa.Table) -> pa.Table:
    """Vectorized derivation of per-version fields from raw events.

    Stateless map_batches stage; ``v`` (the per-entity version number)
    is assigned later, after the group-by-entity shuffle, because it
    needs the full ordered history of each entity.
    """
    user = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)  # us
    etype = batch["event_type"].to_pylist()
    value = batch["value"].to_numpy(zero_copy_only=False)
    props = batch["props"].to_pylist()
    kk = np.array([json.loads(p)["k"] for p in props], dtype=np.int64)
    uid = np.round(value * 100).astype(np.int64) % 37
    visible = np.array([e != "error" for e in etype], dtype=bool)
    return pa.table(
        {
            "osm_id": pa.array(user),
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts": pa.array(ts),
            "uid": pa.array(uid),
            "visible": pa.array(visible),
            "etype": pa.array(etype, type=pa.string()),
            "kk": pa.array(kk),
        }
    )


def coords_for(osm_id: np.ndarray, v: np.ndarray, kk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic fixed-point coordinates (int64-exact, SQL-mirrorable)."""
    gv = (v + 1) // 2
    lon = (osm_id * 7919 + gv * 104729 + kk * 31) % LON_MOD - LON_MOD // 2
    lat = (osm_id * 15485863 + gv * 32452843 + kk * 37) % LAT_MOD - LAT_MOD // 2
    return lon.astype(np.int64), lat.astype(np.int64)


def _pack_document(group: pd.DataFrame) -> pa.Table:
    """Pack one entity's ordered versions into a span-document row.

    Mirrors the reference's history packing (delta-encode per entity,
    ``impl/osh/OSHNodeImpl.java:197-275``) with spans instead of a
    varint blob. Span layout per FIXTURES.md: version span, tag spans
    sorted by key, geom span when visible; ``offset`` is the total
    order, versions oldest -> newest.
    """
    g = group.sort_values(["ts", "event_id"], kind="mergesort")
    osm_id = int(g["osm_id"].iloc[0])
    n = len(g)
    v = np.arange(1, n + 1, dtype=np.int64)
    ts = g["ts"].to_numpy()
    uid = g["uid"].to_numpy()
    vis = g["visible"].to_numpy()
    et = g["etype"].to_numpy()
    kk = g["kk"].to_numpy()
    cs = osm_id * 1_000_000 + (v - 1) // 3
    lon, lat = coords_for(np.full(n, osm_id, dtype=np.int64), v, kk)

    kinds: list[str] = []
    texts: list[str] = []
    refs: list[str] = []
    for i in range(n):
        kinds.append("version")
        texts.append(f"v={v[i]};ts={ts[i]};cs={cs[i]};uid={uid[i]};vis={1 if vis[i] else 0}")
        refs.append("")
        # tags sorted by key: 'etype' < 'k'
        kinds.append("tag")
        texts.append(f"etype={et[i]}")
        refs.append("")
        kinds.append("tag")
        texts.append(f"k={kk[i]}")
        refs.append("")
        if vis[i]:
            kinds.append("geom")
            texts.append("")
            refs.append(f"geom:v={v[i]};lon={lon[i]};lat={lat[i]}")
    offsets = list(range(len(kinds)))
    spans = [
        {"kind": k, "text": t, "media_ref": r, "offset": o}
        for k, t, r, o in zip(kinds, texts, refs, offsets)
    ]
    vis_lon = lon[vis]
    vis_lat = lat[vis]
    return pa.table(
        {
            "doc_id": [f"node/{osm_id}"],
            "osm_type": ["node"],
            "osm_id": [osm_id],
            "n_versions": [n],
            "min_lon_e7": [int(vis_lon.min()) if len(vis_lon) else 0],
            "max_lon_e7": [int(vis_lon.max()) if len(vis_lon) else 0],
            "min_lat_e7": [int(vis_lat.min()) if len(vis_lat) else 0],
            "max_lat_e7": [int(vis_lat.max()) if len(vis_lat) else 0],
            "spans": [spans],
        },
        schema=DOCUMENTS_SCHEMA,
    )


def build_documents(sf_dir: str) -> ray.data.Dataset:
    """events.parquet -> span-document Dataset (the ingest pipeline)."""
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    derived = ev.map_batches(derive_version_columns, batch_format="pyarrow")
    # the one ingest shuffle: co-locate each entity's versions
    return derived.groupby("osm_id").map_groups(_pack_document, batch_format="pandas")


def ensure_documents(sf_dir: str) -> str:
    """Materialize (once) and return the span-document table path.

    Cached per (sf_dir, events mtime) under ``RAYHIST_CACHE``; the
    cache directory is written atomically (tmp dir + rename) so
    concurrent callers and re-runs are safe — the same
    write-to-temp-then-rename rule the checkpointed pipelines use.
    """
    src = Path(sf_dir) / "events.parquet"
    key = hashlib.sha256(f"{src.resolve()}:{src.stat().st_mtime_ns}:v3".encode()).hexdigest()[:16]
    out = Path(CACHE_ROOT) / key / "documents_spans"
    if out.exists():
        return str(out)
    tmp = Path(CACHE_ROOT) / key / f".tmp_{os.getpid()}"
    ds = build_documents(sf_dir)
    rio.write_table(ds, str(tmp))
    try:
        tmp.rename(out)
    except OSError:  # lost the race: another process finished first
        if not out.exists():
            raise
    return str(out)


def read_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the (cached) span-document table for a scale-factor dir."""
    return rio.read_table(ensure_documents(sf_dir), columns=columns)
