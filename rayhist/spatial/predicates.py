"""Exact vectorized integer geometry predicates.

Orientation (the sign of the 2D cross product) over e7 integer
coordinates without ever leaving int64: each product
``(bx-ax)*(cy-ay)`` is bounded by 2^32 * 2^31 < 2^63 (lon deltas fit
32 bits, lat deltas 31), so the PRODUCTS are exact — only their
DIFFERENCE can overflow. The difference's SIGN is all orientation
needs, and it is recoverable without the subtraction: when the two
products have the same sign the difference cannot overflow; when they
differ the sign of the difference is the sign of the first product.
(The float-free analog of Shewchuk's adaptive orient2d fast path —
reference geometry semantics: oshdb-util Geo.java operates on the same
e7 integer lattice.)

Used by the segment-crossing family; the DuckDB oracle mirrors the
same formula through HUGEINT casts.
"""

from __future__ import annotations

import numpy as np

_LON_SPAN = np.int64(1) << 32  # |lon delta| < 2^32 (e7 lon is +-1.8e9)
_LAT_SPAN = np.int64(1) << 31  # |lat delta| < 2^31 (e7 lat is +-0.9e9)


def orient_sign(
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    cx: np.ndarray,
    cy: np.ndarray,
) -> np.ndarray:
    """sign((B-A) x (C-A)) as int8 in {-1, 0, 1}, exact for e7 integer
    lattices: +1 = C left of A->B, -1 = right, 0 = collinear. Raises
    loudly if a delta exceeds the exactness envelope instead of
    silently wrapping."""
    dx1 = np.asarray(bx, dtype=np.int64) - ax
    dy1 = np.asarray(by, dtype=np.int64) - ay
    dx2 = np.asarray(cx, dtype=np.int64) - ax
    dy2 = np.asarray(cy, dtype=np.int64) - ay
    for d, span in ((dx1, _LON_SPAN), (dx2, _LON_SPAN), (dy1, _LAT_SPAN), (dy2, _LAT_SPAN)):
        if len(np.atleast_1d(d)) and int(np.abs(d).max()) >= int(span):
            raise ValueError(
                "orient_sign: coordinate delta exceeds the exact-int64 envelope "
                f"(|delta| must be < {int(span)})"
            )
    p1 = dx1 * dy2  # |.| < 2^63: exact
    p2 = dy1 * dx2
    out = np.where(p1 >= 0, 1, -1).astype(np.int8)  # the differing-signs answer
    same = (p1 >= 0) == (p2 >= 0)
    if same.any():
        d = p1[same] - p2[same]  # same sign -> |d| <= max(|p1|,|p2|): exact
        out[same] = np.sign(d).astype(np.int8)
    return out


def segments_cross(
    ax, ay, bx, by, cx, cy, dx, dy
) -> np.ndarray:
    """True where segment AB PROPERLY crosses segment CD (interiors
    intersect at a single point; touching endpoints and collinear
    overlap are NOT crossings — the sign products must be strictly
    negative on both sides). All arrays broadcast together."""
    o1 = orient_sign(ax, ay, bx, by, cx, cy).astype(np.int16)
    o2 = orient_sign(ax, ay, bx, by, dx, dy).astype(np.int16)
    o3 = orient_sign(cx, cy, dx, dy, ax, ay).astype(np.int16)
    o4 = orient_sign(cx, cy, dx, dy, bx, by).astype(np.int16)
    return (o1 * o2 < 0) & (o3 * o4 < 0)


def point_segment_d2(
    px: np.ndarray,
    py: np.ndarray,
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
) -> np.ndarray:
    """Squared point-to-segment distance in e7 units, broadcast over
    any common shape, as ONE FIXED IEEE EXPRESSION TREE: the integer
    coordinate diffs are exact in int64 and cast exactly to float64,
    and every subsequent op (mul/add/div/sub per projection branch)
    appears in the same shape in the SQL mirror
    (oracles.nearest_road_distance), so results are bit-identical
    across engines. Degenerate zero-length segments resolve through
    the dot <= 0 branch (dot is exactly 0)."""
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    ax = np.asarray(ax, dtype=np.int64)
    ay = np.asarray(ay, dtype=np.int64)
    bx = np.asarray(bx, dtype=np.int64)
    by = np.asarray(by, dtype=np.int64)
    dxpa = (px - ax).astype(np.float64)
    dypa = (py - ay).astype(np.float64)
    dxpb = (px - bx).astype(np.float64)
    dypb = (py - by).astype(np.float64)
    dxba = (bx - ax).astype(np.float64)
    dyba = (by - ay).astype(np.float64)
    dot = dxpa * dxba + dypa * dyba
    len2 = dxba * dxba + dyba * dyba
    dpa2 = dxpa * dxpa + dypa * dypa
    dpb2 = dxpb * dxpb + dypb * dypb
    t = np.divide(dot, len2, out=np.zeros_like(dot), where=len2 > 0)
    ex = dxpa - t * dxba
    ey = dypa - t * dyba
    din = ex * ex + ey * ey
    return np.where(dot <= 0, dpa2, np.where(dot >= len2, dpb2, din))
