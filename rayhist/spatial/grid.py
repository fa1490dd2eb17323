"""Hierarchical equal-degree grid — the spatial partition key.

A from-scratch rebuild of the reference's multi-zoom XYGrid
(``oshdb/.../index/XYGrid.java:14-41``, ``getId`` :124-149) and
XYGridTree pyramid (``index/XYGridTree.java:27-97``): at zoom z the
world is ``2^z`` columns x ``max(1, 2^(z-1))`` rows of equal-degree
tiles, row-major ``cell = y * 2^z + x``; the pyramid spans zoom
0..MAXZOOM (reference MAXZOOM=15, OSHDB.java:5). Longitude wraps at
the antimeridian (lon=180 maps to x=0, XYGrid.java:124-149); the
north-pole border row is clamped into the top row.

Everything is integer arithmetic on fixed-point e7 coordinates so the
exact same cell assignment is expressible in ANSI SQL (the DuckDB
oracles replicate these formulas literally) and runs vectorized in
numpy inside ``map_batches``.

This grid plays the role an H3/S2 index would on a production
deployment: a single int64 partition key, coarse resolutions for large
features, fine for points. Swapping in H3 is a one-stage change (this
module is the only place cell ids are computed).
"""

from __future__ import annotations

import numpy as np

from ..model import LAT_MOD, LON_MOD

MAXZOOM = 15


def grid_dims(zoom: int) -> tuple[int, int]:
    """(nx, ny) of the equal-degree grid at a zoom: 2^z columns,
    2^(z-1) rows (1 row at zoom 0 AND 1) — the reference's XYGrid
    shape. The ONE definition; an H3/S2 swap changes only this."""
    return 1 << zoom, 1 << max(zoom - 1, 0)


def cell_id(lon_e7, lat_e7, zoom: int):
    """Vectorized point -> row-major cell id at a zoom level."""
    lon = np.asarray(lon_e7, dtype=np.int64)
    lat = np.asarray(lat_e7, dtype=np.int64)
    nx, ny = (np.int64(d) for d in grid_dims(zoom))
    x = ((lon + LON_MOD // 2) % LON_MOD) * nx // LON_MOD
    y = (lat + LAT_MOD // 2) * ny // LAT_MOD
    y = np.minimum(y, ny - 1)  # lat=+90 border -> top row
    return y * nx + x


def pack_cell(zoom: int, cell) -> np.ndarray:
    """zoom<<56 | cell — the reference's CellId.levelId convention
    (oshdb/.../util/CellId.java:36-48)."""
    return (np.int64(zoom) << 56) | np.asarray(cell, dtype=np.int64)


def cell_bounds(zoom: int, cell: int) -> tuple[int, int, int, int]:
    """cell -> (min_lon_e7, min_lat_e7, max_lon_e7, max_lat_e7),
    half-open on the east/north edges (XYGrid.getCellDimensions
    analog, :177-202)."""
    nx, ny = grid_dims(zoom)
    y, x = divmod(int(cell), nx)

    def ceildiv(a: int, b: int) -> int:
        return -(-a // b)

    # exact rational bounds consistent with cell_id's floor division:
    # lon' belongs to cell x  iff  lon'*nx // LON_MOD == x
    return (
        ceildiv(x * LON_MOD, nx) - LON_MOD // 2,
        ceildiv(y * LAT_MOD, ny) - LAT_MOD // 2,
        ceildiv((x + 1) * LON_MOD, nx) - LON_MOD // 2,
        ceildiv((y + 1) * LAT_MOD, ny) - LAT_MOD // 2,
    )


def insert_zoom(
    min_lon_e7: np.ndarray,
    max_lon_e7: np.ndarray,
    min_lat_e7: np.ndarray,
    max_lat_e7: np.ndarray,
    max_zoom: int = MAXZOOM,
) -> np.ndarray:
    """Deepest zoom whose cells cover each bbox with at most 2 cells,
    walking up otherwise — the XYGridTree insert rule
    (``XYGridTree.getInsertId``, index/XYGridTree.java:89-97).

    Vectorized over entities: a point gets ``max_zoom``; a bbox gets
    the deepest level where it spans <=2 cells in each axis and <=2
    total.
    """
    lo_x = np.asarray(min_lon_e7, dtype=np.int64) + LON_MOD // 2
    hi_x = np.asarray(max_lon_e7, dtype=np.int64) + LON_MOD // 2
    lo_y = np.asarray(min_lat_e7, dtype=np.int64) + LAT_MOD // 2
    hi_y = np.asarray(max_lat_e7, dtype=np.int64) + LAT_MOD // 2
    out = np.zeros(len(lo_x), dtype=np.int64)
    done = np.zeros(len(lo_x), dtype=bool)
    for z in range(max_zoom, -1, -1):
        nx, ny = grid_dims(z)
        cx0 = lo_x * nx // LON_MOD
        cx1 = hi_x * nx // LON_MOD
        cy0 = np.minimum(lo_y * ny // LAT_MOD, ny - 1)
        cy1 = np.minimum(hi_y * ny // LAT_MOD, ny - 1)
        span = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        ok = (~done) & (span <= 2)
        out[ok] = z
        done |= ok
        if done.all():
            break
    return out


def insert_cell(lon_e7, lat_e7, zoom) -> np.ndarray:
    """Vectorized cell id with a PER-ROW zoom — the cell an entity is
    stored at: its bbox's south-west corner at its insert zoom
    (``XYGridTree.getInsertId``, index/XYGridTree.java:89-97)."""
    lon = np.asarray(lon_e7, dtype=np.int64)
    lat = np.asarray(lat_e7, dtype=np.int64)
    z = np.asarray(zoom, dtype=np.int64)
    nx = np.int64(1) << z
    ny = np.int64(1) << np.maximum(z - 1, 0)  # zoom 0 and 1 both have 1 row
    x = ((lon + LON_MOD // 2) % LON_MOD) * nx // LON_MOD
    y = np.minimum((lat + LAT_MOD // 2) * ny // LAT_MOD, ny - 1)
    return y * nx + x


def multizoom_query_cells(
    min_lon_e7: int,
    min_lat_e7: int,
    max_lon_e7: int,
    max_lat_e7: int,
    max_zoom: int = MAXZOOM,
) -> np.ndarray:
    """Packed ``zoom<<56|cell`` candidate ids at EVERY zoom 0..max_zoom
    for a bbox query — the multi-zoom query rule
    (``XYGridTree.bbox2CellIdRanges``, index/XYGridTree.java:219-248).

    At each zoom the bbox is enlarged by ONE tile to the south-west
    (``XYGrid.java:359-367``): an entity is stored at the cell of its
    bbox's SW corner, and its bbox spans at most 2 cells at its insert
    zoom, so the SW corner sits at most one tile west OR south of any
    tile the entity touches — the enlargement makes the enumeration
    sound (no false negatives), exactness comes from the per-version
    test after interpolation. Large features stored at coarse zooms are
    caught because every zoom is enumerated — the coarse-cell fallback
    the single-zoom query path lacks."""
    out = []
    for z in range(max_zoom + 1):
        nx, ny = grid_dims(z)
        x0 = int((min_lon_e7 + LON_MOD // 2) * nx // LON_MOD) - 1  # one tile W
        x1 = int((max_lon_e7 + LON_MOD // 2) * nx // LON_MOD)
        y0 = max(int((min_lat_e7 + LAT_MOD // 2) * ny // LAT_MOD) - 1, 0)  # one S
        y1 = min(int((max_lat_e7 + LAT_MOD // 2) * ny // LAT_MOD), ny - 1)
        if x1 - x0 + 1 >= nx:
            xs = np.arange(nx, dtype=np.int64)
        else:
            xs = np.arange(x0, x1 + 1, dtype=np.int64) % nx  # antimeridian wrap
        ys = np.arange(y0, y1 + 1, dtype=np.int64)
        out.append(pack_cell(z, (ys[:, None] * nx + xs[None, :]).ravel()))
    return np.concatenate(out)


def bbox_cells(zoom: int, min_lon_e7: int, min_lat_e7: int, max_lon_e7: int, max_lat_e7: int) -> np.ndarray:
    """All cell ids at one zoom intersecting a (non-wrapping) bbox —
    the per-level half of ``XYGridTree.bbox2CellIdRanges``
    (index/XYGridTree.java:219-248). Used for partition pruning at the
    read (the Ray analog of the SQL ``id BETWEEN ?`` cell fetch,
    backend/MapReducerJdbc.java:51-114)."""
    nx, ny = grid_dims(zoom)
    x0 = int((min_lon_e7 + LON_MOD // 2) * nx // LON_MOD)
    x1 = int((max_lon_e7 + LON_MOD // 2) * nx // LON_MOD)
    y0 = min(int((min_lat_e7 + LAT_MOD // 2) * ny // LAT_MOD), ny - 1)
    y1 = min(int((max_lat_e7 + LAT_MOD // 2) * ny // LAT_MOD), ny - 1)
    xs = np.arange(x0, x1 + 1, dtype=np.int64) % nx
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    return (ys[:, None] * nx + xs[None, :]).ravel()
