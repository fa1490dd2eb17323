"""Geodesic scalar functions — numpy ports of the reference's ``Geo``
(``oshdb-util/.../geometry/Geo.java:19-179``), same constants and
formulas so derived metrics are value-compatible:

- earth radius 6_371_000 m (Geo.java:19)
- segment length: equirectangular approximation (Geo.java:37-45)
- haversine (Geo.java:25-34)
- ring area: spherical-excess formula ported from mapbox/geojson-area
  (Chamberlain & Duquette, JPL 07-03) (Geo.java:147-180)

All functions are vectorized over coordinate arrays in DEGREES
(convert from fixed-point e7 with ``e7 / 1e7``).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6_371_000.0  # meters (Geo.java:19)


def distance_equirectangular(lat1, lng1, lat2, lng2):
    """Equirectangular segment distance (Geo.distanceBetweenCoordinates,
    Geo.java:37-45). Good for short segments; matches reference."""
    d_lat = np.radians(np.asarray(lat2) - np.asarray(lat1))
    d_lng = np.radians(np.asarray(lng2) - np.asarray(lng1))
    d_lng = d_lng * np.cos(np.radians((np.asarray(lat2) + np.asarray(lat1)) / 2))
    return EARTH_RADIUS * np.sqrt(d_lng * d_lng + d_lat * d_lat)


def distance_haversine(lat1, lng1, lat2, lng2):
    """Haversine distance (Geo.distanceBetweenCoordinatesHaversine,
    Geo.java:25-34)."""
    d_lat = np.radians(np.asarray(lat2) - np.asarray(lat1))
    d_lng = np.radians(np.asarray(lng2) - np.asarray(lng1))
    a = (
        np.sin(d_lat / 2) ** 2
        + np.cos(np.radians(np.asarray(lat1)))
        * np.cos(np.radians(np.asarray(lat2)))
        * np.sin(d_lng / 2) ** 2
    )
    return EARTH_RADIUS * 2 * np.arctan2(np.sqrt(a), np.sqrt(1 - a))


def length_of_line(lons: np.ndarray, lats: np.ndarray) -> float:
    """Sum of equirectangular segment lengths (Geo.lengthOf, :47-60)."""
    if len(lons) < 2:
        return 0.0
    return float(
        distance_equirectangular(lats[:-1], lons[:-1], lats[1:], lons[1:]).sum()
    )


def ring_area(lons: np.ndarray, lats: np.ndarray) -> float:
    """Signed spherical ring area (Geo.ringArea, Geo.java:147-180).

    Positive for clockwise rings (as in the reference's port of
    mapbox/geojson-area). Input ring need not be closed.
    """
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if len(lons) == 0:
        return 0.0
    if np.array_equal([lons[0], lats[0]], [lons[-1], lats[-1]]):
        lons, lats = lons[:-1], lats[:-1]
    n = len(lons)
    if n <= 2:
        return 0.0
    lo = np.radians(lons)
    la = np.radians(lats)
    p1 = lo  # lower
    p3 = np.roll(lo, -2)  # upper (the middle point contributes only
    # its latitude — mid_lat below)
    mid_lat = np.roll(la, -1)
    area = float(((p3 - p1) * np.sin(mid_lat)).sum())
    return area * EARTH_RADIUS * EARTH_RADIUS / 2


def area_of_polygon(outer: tuple[np.ndarray, np.ndarray], holes=()) -> float:
    """|outer| - sum(|holes|) (Geo.areaOf, Geo.java:95-101)."""
    area = abs(ring_area(*outer))
    for h in holes:
        area -= abs(ring_area(*h))
    return area
