"""Geohash encoding over fixed-point e7 coordinates — pure integers.

A geohash at precision P is the base32 rendering of 5*P bits that
alternate longitude/latitude bisections MSB-first starting with
longitude. Bisecting [-180, 180) k times and taking the branch bits is
EXACTLY the top-k bits of floor((lon + 180) * 2^k / 360) — so the
whole encode is two integer scaled divisions plus a bit interleave,
no floats anywhere, and the cell id is bit-stable under any
partitioning (a safe shuffle key, like spatial/hexgrid and
spatial/s2). The SQL mirror is the same expression spelled as a
25-term shift-and sum (oracles.snapshot_count_by_geohash).

Reference parity: the reference's spatial keys are the XYGrid cells
(oshdb/src/main/java/.../index/XYGrid.java); geohash is the
string-keyed industry-standard sibling, a target-only addition.
"""

from __future__ import annotations

import numpy as np

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
PRECISION = 5  # 25 bits: 13 lon + 12 lat (~4.9 x 4.9 km cells)
_LON_BITS = 13
_LAT_BITS = 12


def geohash_bits(lon_e7: np.ndarray, lat_e7: np.ndarray) -> np.ndarray:
    """Packed 25-bit geohash cell id per point (int64). Inputs are
    fixed-point degree*1e7 ints in [-1.8e9, 1.8e9) / [-9e8, 9e8)."""
    lon = np.asarray(lon_e7, dtype=np.int64)
    lat = np.asarray(lat_e7, dtype=np.int64)
    bx = ((lon + 1_800_000_000) * (1 << _LON_BITS)) // 3_600_000_000
    by = ((lat + 900_000_000) * (1 << _LAT_BITS)) // 1_800_000_000
    if bx.size and (bx.min() < 0 or bx.max() >= (1 << _LON_BITS)):
        raise ValueError("geohash_bits: longitude outside [-180, 180)")
    if by.size and (by.min() < 0 or by.max() >= (1 << _LAT_BITS)):
        raise ValueError("geohash_bits: latitude outside [-90, 90)")
    g = np.zeros(len(bx), dtype=np.int64)
    for k in range(_LON_BITS):  # lon bit k -> even position 2k
        g |= ((bx >> k) & 1) << (2 * k)
    for k in range(_LAT_BITS):  # lat bit k -> odd position 2k+1
        g |= ((by >> k) & 1) << (2 * k + 1)
    return g


def geohash_str(g: int) -> str:
    """Base32 string of one packed 25-bit cell id (5 characters)."""
    return "".join(
        GEOHASH_ALPHABET[(int(g) >> (5 * (PRECISION - 1 - c))) & 31]
        for c in range(PRECISION)
    )
