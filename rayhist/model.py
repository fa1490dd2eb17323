"""Data model: the interleaved span-document table and its codec.

The primary table (per ``BASELINE.json.input_hint``) holds one row per
entity history ("OSH entity" in the reference,
``oshdb/src/main/java/org/heigit/bigspatialdata/oshdb/osh/OSHEntity.java:11-34``):

    doc_id: string          -- "{type}/{osm_id}", type in {node, way, relation}
    spans:  list<struct<
        kind:      string   -- 'version' | 'tag' | 'member' | 'geom'
        text:      string   -- see SPAN TEXT FORMATS below
        media_ref: string   -- geom spans: self-describing blob key; '' otherwise
        offset:    int32    -- 0-based position in the document's span stream
    >>

SPAN TEXT FORMATS (one 'version' span, then its 'tag' spans sorted by
key, then 'member' spans in ref order, then one 'geom' span when the
version is visible; versions oldest->newest; ``offset`` is the total
order — the per-row invariant vs the generator is span-sequence
equality on ``(kind, text, media_ref, offset)``):

    version:  "v={v};ts={ts_us};cs={changeset};uid={uid};vis={0|1}"
    tag:      "{key}={value}"
    member:   "{type}/{ref_id}@role={role}"
    geom:     text='', media_ref="geom:v={v};lon={lon_e7};lat={lat_e7}"

Timestamps are int64 unix MICROSECONDS. Coordinates are fixed-point
int64, degrees * 1e7, mirroring the reference's
``GEOM_PRECISION_TO_LONG = 10_000_000`` (``oshdb/.../OSHDB.java:8-9``).

The reference packs one history into a delta/varint byte blob
(``impl/osh/OSHNodeImpl.java:145-275``); here the equivalent payload is
the spans list and the heavy lifting (dictionary/RLE encodings) is done
by Arrow/Lance/Parquet column encodings. ``media_ref`` is
self-describing in the sandbox generator (no external blob store); a
production deployment would key a blob-store object instead — the
decode below only touches the string, so swapping the resolver is a
one-stage change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Fixed-point coordinate convention (reference: OSHDB.java:8-9).
GEOM_PRECISION_TO_LONG = 10_000_000
LON_MOD = 3_600_000_000  # 360 degrees in 1e-7 units
LAT_MOD = 1_800_000_000  # 180 degrees in 1e-7 units

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("osm_type", pa.string()),  # node | way | relation
        pa.field("osm_id", pa.int64()),
        pa.field("n_versions", pa.int32()),
        # bbox over all versions (prefilter index, like OSHEntity.getBoundingBox)
        pa.field("min_lon_e7", pa.int64()),
        pa.field("max_lon_e7", pa.int64()),
        pa.field("min_lat_e7", pa.int64()),
        pa.field("max_lat_e7", pa.int64()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        # int-keytable tag storage (osm/OSMEntity.java:29,97-152): one
        # keytable id per VERSION (order-aligned with the version
        # spans), indexing the Extract pass's tag dictionary
        # (ingest.ensure_keytable). Filters scan these ints instead of
        # tag_sig strings; the string spans stay for oracle parity.
        # Empty list = no per-version ids (compound tables).
        pa.field("tag_ids", pa.list_(pa.int32())),
    ]
)

# Flat per-version table produced by decode_spans (the analog of the
# reference's decoded OSMEntity stream, osm/OSMEntity.java:13-39).
VERSIONS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("osm_type", pa.string()),
        pa.field("osm_id", pa.int64()),
        pa.field("v", pa.int64()),
        pa.field("ts", pa.int64()),  # unix microseconds
        pa.field("cs", pa.int64()),  # changeset id
        pa.field("uid", pa.int64()),  # contributor user id
        pa.field("visible", pa.bool_()),
        pa.field("lon_e7", pa.int64()),  # 0 when not visible (ref: OSHNodeImpl.java:173-175)
        pa.field("lat_e7", pa.int64()),
        pa.field("tag_sig", pa.string()),  # '|'-joined "k=v" tag spans (sorted by key)
        pa.field("etype", pa.string()),  # value of the 'etype' tag ('' if absent)
        pa.field("kk", pa.int64()),  # value of the 'k' tag (-1 if absent)
        pa.field("tag_id", pa.int32()),  # keytable id (-1 when absent/undecoded)
    ]
)

_VERSION_RE = r"^v=(\d+);ts=(\d+);cs=(\d+);uid=(\d+);vis=([01])$"
_GEOM_RE = r"^geom:v=(\d+);lon=(-?\d+);lat=(-?\d+)$"


def format_version_text(v: int, ts: int, cs: int, uid: int, vis: int) -> str:
    return f"v={v};ts={ts};cs={cs};uid={uid};vis={vis}"


def format_geom_ref(v: int, lon_e7: int, lat_e7: int) -> str:
    return f"geom:v={v};lon={lon_e7};lat={lat_e7}"


def _extract_ints(texts: pa.Array, pattern: str, names: list[str]) -> dict[str, np.ndarray]:
    """Vectorized regex field extraction -> int64 numpy arrays.

    ``pattern`` may already carry named groups (``(?P<...>``); plain
    groups are named positionally from ``names``."""
    if "(?P<" in pattern:
        named = pattern
    else:
        parts = pattern.split("(")
        named = parts[0]
        for i, p in enumerate(parts[1:]):
            named += f"(?P<{names[i]}>" + p
    struct = pc.extract_regex(texts, named)
    return {
        n: struct.field(n).cast(pa.int64()).to_numpy(zero_copy_only=False)
        for n in names
    }


def _parse_fixed(
    texts: pa.Array,
    fields: list[tuple[str, str]],
    pattern: str,
) -> dict[str, np.ndarray]:
    """Delimiter parse of the fixed ``k=v;k=v;...`` span layout:
    split on ';', take the i-th element, verify its ``k=`` prefix,
    slice, cast. ~2x faster than ``extract_regex`` on the same input
    (measured 82 vs 162 ms per 200k version spans) — the span parse is
    the single hottest kernel in every history query. Falls back to
    the anchored regex if the part count, any key prefix, or a cast
    rejects (ingest always emits the fixed form; the fallback keeps
    malformed input on the strict path instead of misparsing it —
    e.g. swapped same-length keys must NOT silently transpose values).

    ``fields``: (output name, exact key prefix incl. '=') per part, in
    span order.
    """
    lists = pc.split_pattern(texts, ";")
    n_parts = pc.sum(pc.list_value_length(lists)).as_py() or 0
    if n_parts != len(texts) * len(fields):
        return _extract_ints(texts, pattern, [n for n, _ in fields])
    try:
        out = {}
        for i, (name, prefix) in enumerate(fields):
            elem = pc.list_element(lists, i)
            if not pc.all(pc.starts_with(elem, prefix)).as_py():
                return _extract_ints(texts, pattern, [n for n, _ in fields])
            out[name] = (
                pc.utf8_slice_codeunits(elem, len(prefix))
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
        return out
    except pa.ArrowInvalid:
        return _extract_ints(texts, pattern, [n for n, _ in fields])


_VERSION_FIELDS = [("v", "v="), ("ts", "ts="), ("cs", "cs="), ("uid", "uid="), ("vis", "vis=")]
_GEOM_FIELDS = [("v", "geom:v="), ("lon", "lon="), ("lat", "lat=")]


def decode_spans(batch: pa.Table, tags: bool | str = True, geom: bool = True) -> pa.Table:
    """Decode a batch of span-documents into the flat per-version table.

    Vectorized: list_flatten + extract_regex + numpy scatter/gather.
    All versions of a document land in the same output batch (the spans
    of one row flatten contiguously), which the temporal stages rely on.

    ``tags=False`` / ``geom=False`` PRUNE the decode: the tag-signature
    join / geometry regex (the two heaviest kernels) are skipped and
    the columns are constant-filled. Callers set them per query — a
    snapshot COUNT needs neither, a cell aggregation needs only geom —
    the decode analog of ``read_parquet(columns=...)``; memory traffic
    is the scaling wall (BASELINE.md), so decoding unread fields is
    wasted bandwidth.

    ``tags="ids"`` is the int-keytable path (osm/OSMEntity.java:29,
    97-152): the per-version ``tag_ids`` column (packed at ingest from
    the Extract keytable) is flattened into ``tag_id`` and NO tag
    string work runs at all — filters compare small ints per version,
    never strings. tag_sig/etype/kk stay constant-filled.

    Mirrors the reference's per-entity delta decode
    (``impl/osh/OSHNodeImpl.java:145-182``) but over Arrow columns.
    """
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):  # single chunk after combine
        spans = spans.chunk(0)
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)

    kind = flat.field("kind")
    text = flat.field("text")
    ref = flat.field("media_ref")

    is_ver = pc.equal(kind, "version").to_numpy(zero_copy_only=False)

    n_ver = int(is_ver.sum())
    # global version ordinal for every span: index of the version span
    # that precedes it (spans are ordered by (doc, offset)).
    gid = np.cumsum(is_ver) - 1  # len == n_spans; tag/geom spans follow their version span

    ver_text = pc.filter(text, pa.array(is_ver))
    vf = _parse_fixed(ver_text, _VERSION_FIELDS, _VERSION_RE)

    lon = np.zeros(n_ver, dtype=np.int64)
    lat = np.zeros(n_ver, dtype=np.int64)
    if geom:
        is_geom = pc.equal(kind, "geom").to_numpy(zero_copy_only=False)
        if is_geom.any():
            geom_ref = pc.filter(ref, pa.array(is_geom))
            gf = _parse_fixed(geom_ref, _GEOM_FIELDS, _GEOM_RE)
            geom_gid = gid[is_geom]
            lon[geom_gid] = gf["lon"]
            lat[geom_gid] = gf["lat"]

    # tag signature per version: join tag texts with '|' — fully
    # vectorized: a ListArray over the group boundaries + binary_join
    tag_sig = np.full(n_ver, "", dtype=object)
    etype = np.full(n_ver, "", dtype=object)
    kk = np.full(n_ver, -1, dtype=np.int64)
    tag_id = np.full(n_ver, -1, dtype=np.int32)
    # the FULL decode exposes tag_id too (the flatten is cheap int
    # work next to the string decode): an arbitrary entity filter
    # reading decoded['tag_id'] under tags=True previously saw the
    # constant -1 and silently matched nothing
    if tags in ("ids", True) and "tag_ids" in batch.column_names:
        tid_col = batch["tag_ids"].combine_chunks()
        if isinstance(tid_col, pa.ChunkedArray):
            tid_col = tid_col.chunk(0)
        flat_ids = pc.list_flatten(tid_col).to_numpy(zero_copy_only=False)
        if len(flat_ids) == n_ver:  # compound tables pack empty lists
            tag_id = flat_ids.astype(np.int32)
    is_tag = (
        pc.equal(kind, "tag").to_numpy(zero_copy_only=False)
        if tags is True
        else np.zeros(1, dtype=bool)
    )
    if is_tag.any():
        tag_gid = gid[is_tag]
        tag_texts = pc.filter(text, pa.array(is_tag))
        bounds = np.flatnonzero(np.r_[True, np.diff(tag_gid) != 0])
        keys = tag_gid[bounds]  # one entry per version that has tags
        offsets = np.r_[bounds, len(tag_gid)].astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), tag_texts)
        joined = pc.binary_join(lists, "|").to_numpy(zero_copy_only=False)
        tag_sig[keys] = joined

        et_mask = pc.starts_with(tag_texts, "etype=").to_numpy(zero_copy_only=False)
        if et_mask.any():
            vals = pc.utf8_slice_codeunits(
                pc.filter(tag_texts, pa.array(et_mask)), 6
            ).to_numpy(zero_copy_only=False)
            etype[tag_gid[et_mask]] = vals
        kk_mask = pc.starts_with(tag_texts, "k=").to_numpy(zero_copy_only=False)
        if kk_mask.any():
            vals = (
                pc.utf8_slice_codeunits(pc.filter(tag_texts, pa.array(kk_mask)), 2)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            kk[tag_gid[kk_mask]] = vals

    ver_parent = parent[is_ver]
    doc_id = batch["doc_id"].combine_chunks().take(pa.array(ver_parent))
    osm_type = batch["osm_type"].combine_chunks().take(pa.array(ver_parent))
    osm_id = batch["osm_id"].combine_chunks().take(pa.array(ver_parent))

    return pa.table(
        {
            "doc_id": doc_id,
            "osm_type": osm_type,
            "osm_id": osm_id,
            "v": pa.array(vf["v"]),
            "ts": pa.array(vf["ts"]),
            "cs": pa.array(vf["cs"]),
            "uid": pa.array(vf["uid"]),
            "visible": pa.array(vf["vis"] == 1),
            "lon_e7": pa.array(lon),
            "lat_e7": pa.array(lat),
            "tag_sig": pa.array(tag_sig.astype(str)),
            "etype": pa.array(etype.astype(str)),
            "kk": pa.array(kk),
            "tag_id": pa.array(tag_id, type=pa.int32()),
        },
        schema=VERSIONS_SCHEMA,
    )


def reverse_version_runs(batch: pa.Table) -> pa.Table:
    """Dirty-history fixture transform: reverse the VERSION-RUN order
    inside every document's span list (a run = one 'version' span plus
    its trailing tag/geom spans) and the per-version ``tag_ids`` list
    to match — producing the unsorted histories the reference tolerates
    via HEADER_TIMESTAMPS_NOT_IN_ORDER (impl/osh/OSHNodeImpl.java:30,
    OSHDB.sortOrder). The temporal interpolators realign per doc, so
    every downstream result must be INVARIANT under this transform
    (pinned by the snapshot_count_daily_unsorted oracle query and
    tests/test_temporal.py)."""
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0)
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    is_ver = pc.equal(flat.field("kind"), "version").to_numpy(zero_copy_only=False)
    gid = np.cumsum(is_ver) - 1  # global version-run id per span
    idx = np.arange(len(parent), dtype=np.int64)
    # primary: doc; then runs in REVERSED order; spans within a run
    # keep their relative order (version span stays first)
    order = np.lexsort((idx, -gid, parent))
    offsets = pa.array(np.r_[0, np.cumsum(lengths)], type=pa.int32())
    new_spans = pa.ListArray.from_arrays(offsets, flat.take(pa.array(order)))
    cols = {c: batch[c] for c in batch.column_names}
    cols["spans"] = new_spans
    if "tag_ids" in batch.column_names:
        tids = batch["tag_ids"].combine_chunks()
        if isinstance(tids, pa.ChunkedArray):
            tids = tids.chunk(0)
        tflat = pc.list_flatten(tids)
        tparent = pc.list_parent_indices(tids).to_numpy(zero_copy_only=False)
        tidx = np.arange(len(tparent), dtype=np.int64)
        torder = np.lexsort((-tidx, tparent))  # reverse within each doc
        tlen = pc.list_value_length(tids).to_numpy(zero_copy_only=False)
        toffsets = pa.array(np.r_[0, np.cumsum(tlen)], type=pa.int32())
        cols["tag_ids"] = pa.ListArray.from_arrays(toffsets, tflat.take(pa.array(torder)))
    return pa.table(cols)
