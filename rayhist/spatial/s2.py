"""S2-style spherical cell index, from scratch (public S2 geometry
scheme: cube-face projection + quadratic ST transform + Hilbert-curve
cell ids; see the published S2 docs / s2geometry sources for the
DESIGN — this is an independent numpy implementation, not a port).

Pipeline role: the north-star partition key for spherical data — a
single int64 whose prefix structure gives hierarchical containment
(parent = id with trailing bits replaced by the sentinel), so
``groupby(s2_cell)`` co-locates spatially-near entities at any level
and range scans [range_min, range_max] enumerate a subtree. The
equal-degree XYGrid (spatial/grid.py) remains the oracle-friendly
default; this module is the drop-in spherical alternative the grid.py
docstring promises.

Layers (and how each is verified):

1. lon/lat -> unit sphere -> cube face + (u,v)  [6 gnomonic charts]
2. (u,v) -> (s,t) via the QUADRATIC transform
       st = 0.5*sqrt(1+3u)        u >= 0
       st = 1 - 0.5*sqrt(1-3u)    u <  0
   (area-uniformity ~2.1x max/min cell area vs 13x for linear)
3. (s,t) -> discrete (i,j) at level 30 (floor(st * 2^30))
   -- layers 1-3 use only single IEEE ops (cos/sin/div/sqrt/floor),
      so a DuckDB oracle replicates them LITERALLY; the
      snapshot_count_by_s2cell query is value-checked at (face,i,j).
4. (face,i,j) -> 64-bit Hilbert cell id:
   id = face<<61 | hilbert_pos<<(2*(30-level)+1) | 1<<(2*(30-level))
   -- a bijection of (face,i,j), verified by inverse round-trip,
      curve continuity (consecutive positions are grid neighbors) and
      parent containment pytest invariants; the oracle needs only the
      (face,i,j) layer because the id layer is that bijection.

The reference's z-order GridOSHEntity cells (oshdb/.../index/
XYGrid.java:124-149) play this role on a flat grid; S2's Hilbert order
improves shuffle locality (consecutive ids are spatially adjacent,
z-order jumps).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1

# Hilbert sub-cell traversal tables. posToIJ[r][pos] gives the 2-bit
# ij quadrant of traversal step `pos` under orientation r (bit0 SWAP,
# bit1 INVERT); posToOrientation[pos] is XORed into r when descending.
_SWAP, _INVERT = 1, 2
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)


def _build_tables():
    pos_to_ij = np.zeros((4, 4), dtype=np.int64)
    base = [0, 1, 3, 2]  # orientation 0: (0,0)->(0,1)->(1,1)->(1,0)
    for r in range(4):
        for pos in range(4):
            ij = base[pos]
            i, j = ij >> 1, ij & 1
            if r & _SWAP:
                i, j = j, i
            if r & _INVERT:
                i, j = 1 - i, 1 - j
            pos_to_ij[r, pos] = i * 2 + j
    ij_to_pos = np.zeros((4, 4), dtype=np.int64)
    for r in range(4):
        for pos in range(4):
            ij_to_pos[r, pos_to_ij[r, pos]] = pos
    return pos_to_ij, ij_to_pos


_POS_TO_IJ, _IJ_TO_POS = _build_tables()


# ------------------------------------------------- layers 1-3 (float)
def lonlat_to_face_st(lon_e7, lat_e7):
    """e7 ints -> (face, s, t). Every step is a single IEEE op on the
    exact inputs so the DuckDB oracle mirrors it literally:
    lon = lon_e7/1e7 ... x = cos(lat)cos(lon) ... quadratic st."""
    lon = np.asarray(lon_e7, dtype=np.int64) / 1e7
    lat = np.asarray(lat_e7, dtype=np.int64) / 1e7
    lam = np.radians(lon)
    phi = np.radians(lat)
    x = np.cos(phi) * np.cos(lam)
    y = np.cos(phi) * np.sin(lam)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # argmax with x-then-y-then-z tie order (the SQL CASE mirrors it)
    axis = np.where((ax >= ay) & (ax >= az), 0, np.where(ay >= az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = axis + np.where(comp < 0, 3, 0)
    # gnomonic (u,v) per face — canonical S2 chart table
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )

    def st(w):
        # np.where evaluates both branches; the inactive one can take
        # sqrt of a negative (|w| may exceed 1/3) — harmless, silenced
        with np.errstate(invalid="ignore"):
            return np.where(w >= 0, 0.5 * np.sqrt(1 + 3 * w), 1 - 0.5 * np.sqrt(1 - 3 * w))

    return face.astype(np.int64), st(u), st(v)


def st_to_ij(s, level: int = MAX_LEVEL) -> np.ndarray:
    n = np.int64(1) << level
    return np.clip(np.floor(s * n).astype(np.int64), 0, n - 1)


def lonlat_to_face_ij(lon_e7, lat_e7, level: int = MAX_LEVEL):
    face, s, t = lonlat_to_face_st(lon_e7, lat_e7)
    return face, st_to_ij(s, level), st_to_ij(t, level)


# --------------------------------------------------- layer 4 (hilbert)
def face_ij_to_cell(face, i, j, level: int = MAX_LEVEL) -> np.ndarray:
    """(face, i, j at `level`) -> packed cell id. Vectorized Hilbert
    encode: `level` table-lookup passes over the whole array."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    r = face & 1  # initial orientation alternates per face
    pos = np.zeros(len(np.atleast_1d(face)), dtype=np.int64)
    for lvl in range(level - 1, -1, -1):
        ij2 = ((i >> lvl) & 1) * 2 + ((j >> lvl) & 1)
        p = _IJ_TO_POS[r, ij2]
        pos = (pos << 2) | p
        r = r ^ _POS_TO_ORIENT[p]
    shift = np.int64(_POS_BITS - 2 * level)
    return (face << np.int64(61)) | (pos << shift) | (np.int64(1) << (shift - 1))


def cell_to_face_ij(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (face, i, j, level): exact inverse of
    face_ij_to_cell (bijection test pins it)."""
    cell = np.asarray(cell, dtype=np.int64)
    lsb = cell & -cell
    # lsb = 1 << (POS_BITS - 2*level - 1)
    lsb_pow = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    level = (np.int64(_POS_BITS) - 1 - lsb_pow) // 2
    face = (cell >> np.int64(61)) & 7
    pos = (cell & ((np.int64(1) << np.int64(61)) - 1)) >> (lsb_pow + 1)
    r = face & 1
    i = np.zeros_like(cell)
    j = np.zeros_like(cell)
    maxlev = int(level.max()) if len(np.atleast_1d(level)) else 0
    for k in range(maxlev):
        active = level > k
        p = (pos >> (2 * (level - 1 - k)).astype(np.int64)) & 3
        ij2 = _POS_TO_IJ[r, p]
        i = np.where(active, (i << 1) | (ij2 >> 1), i)
        j = np.where(active, (j << 1) | (ij2 & 1), j)
        r = np.where(active, r ^ _POS_TO_ORIENT[p], r)
    return face, i, j, level


def s2_cell(lon_e7, lat_e7, level: int = MAX_LEVEL) -> np.ndarray:
    """Point -> S2-style cell id at a level (the partition key)."""
    face, i, j = lonlat_to_face_ij(lon_e7, lat_e7, level)
    return face_ij_to_cell(face, i, j, level)


def s2_parent(cell, level: int) -> np.ndarray:
    """Ancestor cell at a coarser level (prefix + sentinel bit)."""
    cell = np.asarray(cell, dtype=np.int64)
    new_lsb = np.int64(1) << np.int64(_POS_BITS - 2 * level - 1)
    return (cell & -(new_lsb << 1).astype(np.int64) | new_lsb).astype(np.int64)


def s2_range(cell) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] of leaf ids under a cell — subtree scans
    are contiguous id ranges (the Hilbert locality payoff)."""
    cell = np.asarray(cell, dtype=np.int64)
    lsb = cell & -cell
    return cell - lsb + 1, cell + lsb - 1
