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
    lon_e7     = (user_id*982_451_653 + gv*373_587_883 + kk*15_485_863)
                   % 3_600_000_000 - 1_800_000_000
    lat_e7     = (user_id*472_882_027 + gv*198_491_317 + kk*32_452_843)
                   % 1_800_000_000 - 900_000_000
    (multipliers are large so coordinates spread over the whole globe;
    all products stay well inside int64)

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
    from .ops.relational import round_half_away

    uid = round_half_away(value * 100).astype(np.int64) % 37
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
    lon = (osm_id * 982451653 + gv * 373587883 + kk * 15485863) % LON_MOD - LON_MOD // 2
    lat = (osm_id * 472882027 + gv * 198491317 + kk * 32452843) % LAT_MOD - LAT_MOD // 2
    return lon.astype(np.int64), lat.astype(np.int64)


def _pack_bucket(group: pd.DataFrame) -> pa.Table:
    """Pack a bucket of COMPLETE entity histories into span-document
    rows, fully vectorized.

    Mirrors the reference's history packing (delta-encode per entity,
    ``impl/osh/OSHNodeImpl.java:197-275``) with spans instead of a
    varint blob. Span layout per FIXTURES.md: version span, tag spans
    sorted by key ('etype' < 'k'), geom span when visible; ``offset``
    is the per-document total order, versions oldest -> newest.

    Called once per hash bucket (many entities per call) — the
    vectorized alternative to per-entity ``map_groups``, which is
    1000x more Python calls at bench scale.
    """
    g = group.sort_values(["osm_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
    osm = g["osm_id"].to_numpy()
    n = len(g)
    doc_start = np.r_[True, osm[1:] != osm[:-1]]
    # per-entity version numbers: global cumcount minus the doc start's
    start_idx = np.maximum.accumulate(np.where(doc_start, np.arange(n), 0))
    v = np.arange(n) - start_idx + 1
    ts = g["ts"].to_numpy()
    uid = g["uid"].to_numpy()
    vis = g["visible"].to_numpy()
    kk = g["kk"].to_numpy()
    cs = osm * 1_000_000 + (v - 1) // 3
    lon, lat = coords_for(osm, v, kk)

    s = pd.Series  # vectorized string building
    vs, tss, css, uids = s(v).astype(str), s(ts).astype(str), s(cs).astype(str), s(uid).astype(str)
    ver_text = ("v=" + vs + ";ts=" + tss + ";cs=" + css + ";uid=" + uids
                + ";vis=" + s(vis.astype(np.int64)).astype(str)).to_numpy()
    tag1 = ("etype=" + g["etype"]).to_numpy()
    tag2 = ("k=" + s(kk).astype(str)).to_numpy()
    geom_ref = ("geom:v=" + vs + ";lon=" + s(lon).astype(str) + ";lat=" + s(lat).astype(str)).to_numpy()

    # interleave spans: slots 0=version 1=tag1 2=tag2 3=geom(if visible)
    n_slots = 3 + vis.astype(np.int64)
    total = int(n_slots.sum())
    ver_of_span = np.repeat(np.arange(n), n_slots)
    span_end = np.cumsum(n_slots)
    slot = np.arange(total) - np.repeat(span_end - n_slots, n_slots)
    kinds = np.array(["version", "tag", "tag", "geom"], dtype=object)[slot]
    texts = np.empty(total, dtype=object)
    refs = np.full(total, "", dtype=object)
    texts[slot == 0] = ver_text[ver_of_span[slot == 0]]
    texts[slot == 1] = tag1[ver_of_span[slot == 1]]
    texts[slot == 2] = tag2[ver_of_span[slot == 2]]
    texts[slot == 3] = ""
    refs[slot == 3] = geom_ref[ver_of_span[slot == 3]]

    # per-document span offsets
    doc_of_span = np.repeat(start_idx, n_slots)  # doc key = start row idx
    doc_first_span = np.r_[True, doc_of_span[1:] != doc_of_span[:-1]]
    doc_span_start = np.maximum.accumulate(np.where(doc_first_span, np.arange(total), 0))
    offsets = (np.arange(total) - doc_span_start).astype(np.int32)

    spans_flat = pa.StructArray.from_arrays(
        [
            pa.array(kinds, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(refs, type=pa.string()),
            pa.array(offsets, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    list_offsets = np.r_[np.flatnonzero(doc_first_span), total].astype(np.int32)
    spans_col = pa.ListArray.from_arrays(pa.array(list_offsets), spans_flat)

    # per-document scalars
    docs_idx = np.flatnonzero(doc_start)
    doc_ids = osm[docs_idx]
    n_versions = np.diff(np.r_[docs_idx, n]).astype(np.int32)
    bb = pd.DataFrame(
        {
            "d": np.repeat(np.arange(len(docs_idx)), n_versions),
            "lon": np.where(vis, lon, np.int64(np.iinfo(np.int64).max)),
            "lon2": np.where(vis, lon, np.int64(np.iinfo(np.int64).min)),
            "lat": np.where(vis, lat, np.int64(np.iinfo(np.int64).max)),
            "lat2": np.where(vis, lat, np.int64(np.iinfo(np.int64).min)),
            "v": vis.astype(np.int64),
        }
    ).groupby("d").agg(mn_lon=("lon", "min"), mx_lon=("lon2", "max"),
                       mn_lat=("lat", "min"), mx_lat=("lat2", "max"), anyv=("v", "max"))
    zero = bb["anyv"].to_numpy() == 0
    for c in ("mn_lon", "mx_lon", "mn_lat", "mx_lat"):
        arr = bb[c].to_numpy().copy()
        arr[zero] = 0
        bb[c] = arr

    return pa.table(
        {
            "doc_id": pa.array(["node/" + str(i) for i in doc_ids], type=pa.string()),
            "osm_type": pa.array(np.full(len(doc_ids), "node", dtype=object), type=pa.string()),
            "osm_id": pa.array(doc_ids),
            "n_versions": pa.array(n_versions, type=pa.int32()),
            "min_lon_e7": pa.array(bb["mn_lon"].to_numpy()),
            "max_lon_e7": pa.array(bb["mx_lon"].to_numpy()),
            "min_lat_e7": pa.array(bb["mn_lat"].to_numpy()),
            "max_lat_e7": pa.array(bb["mx_lat"].to_numpy()),
            "spans": spans_col,
        },
        schema=DOCUMENTS_SCHEMA,
    )


REP_STRIDE = 10_000_000  # replica r gets osm_id + r * REP_STRIDE


def build_documents(sf_dir: str, rep: int = 1) -> ray.data.Dataset:
    """events.parquet -> span-document Dataset (the ingest pipeline).

    ``rep`` deterministically amplifies the corpus for benchmarks:
    replica r of an entity gets ``osm_id + r*REP_STRIDE`` — its
    coordinates (a function of osm_id) differ, so replicas spread over
    the grid like independent entities. rep=1 (the default, used by
    all correctness queries) is a byte-stable identity.
    """
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    derived = ev.map_batches(derive_version_columns, batch_format="pyarrow")
    if rep > 1:
        import pyarrow.compute as pc

        def replicate(batch: pa.Table) -> pa.Table:
            parts = []
            for r in range(rep):
                t = batch.set_column(
                    batch.schema.get_field_index("osm_id"),
                    "osm_id",
                    pc.add(batch["osm_id"], r * REP_STRIDE),
                )
                parts.append(t)
            return pa.concat_tables(parts)

        derived = derived.map_batches(replicate, batch_format="pyarrow")

    # the one ingest shuffle: co-locate each entity's versions. Bucket
    # by entity-id hash so each map_groups call packs MANY complete
    # histories vectorized (per-entity calls would be 1000x the Python
    # overhead at scale).
    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch["osm_id"].to_numpy(zero_copy_only=False) % 256
        return batch.append_column("_bucket", pa.array(b.astype(np.int64)))

    return (
        derived.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(lambda g: _pack_bucket(g.drop(columns=["_bucket"])), batch_format="pandas")
    )


def ensure_documents(sf_dir: str, rep: int = 1) -> str:
    """Materialize (once) and return the span-document table path.

    Cached per (sf_dir, events mtime) under ``RAYHIST_CACHE``; the
    cache directory is written atomically (tmp dir + rename) so
    concurrent callers and re-runs are safe — the same
    write-to-temp-then-rename rule the checkpointed pipelines use.
    """
    src = Path(sf_dir) / "events.parquet"
    key = hashlib.sha256(
        f"{src.resolve()}:{src.stat().st_mtime_ns}:rep{rep}:v5".encode()
    ).hexdigest()[:16]
    out = Path(CACHE_ROOT) / key / "documents_spans"
    if out.exists():
        return str(out)
    tmp = Path(CACHE_ROOT) / key / f".tmp_{os.getpid()}"
    ds = build_documents(sf_dir, rep)
    rio.write_table(ds, str(tmp))
    try:
        tmp.rename(out)
    except OSError:  # lost the race: another process finished first
        if not out.exists():
            raise
    return str(out)


def read_documents(
    sf_dir: str, columns: list[str] | None = None, rep: int = 1
) -> ray.data.Dataset:
    """Read the (cached) span-document table for a scale-factor dir."""
    return rio.read_table(ensure_documents(sf_dir, rep), columns=columns)
