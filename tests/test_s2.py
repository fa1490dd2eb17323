"""S2-style cell index invariants (spatial/s2.py).

The float layers (face/st/ij) are value-checked against DuckDB by the
snapshot_count_by_s2cell oracle; these tests pin the Hilbert id layer
(a bijection of (face,i,j)) and the hierarchy semantics.
"""

import numpy as np

from rayhist.spatial import s2

RNG = np.random.default_rng(7)
LON = RNG.integers(-1800000000, 1800000000, 5000)
LAT = RNG.integers(-900000000, 900000001, 5000)


def test_encode_decode_bijection_all_levels():
    for level in (30, 17, 8, 3, 1):
        f, i, j = s2.lonlat_to_face_ij(LON, LAT, level)
        c = s2.face_ij_to_cell(f, i, j, level)
        f2, i2, j2, l2 = s2.cell_to_face_ij(c)
        assert (f2 == f).all() and (i2 == i).all() and (j2 == j).all()
        assert (l2 == level).all()


def test_hilbert_continuity_within_each_face():
    """Sorted-by-id traversal visits grid neighbors (|di|+|dj| == 1):
    the locality property that makes range scans spatially compact."""
    level = 6
    n = 1 << level
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    for face in range(6):
        c = s2.face_ij_to_cell(np.full(n * n, face), ii.ravel(), jj.ravel(), level)
        assert len(np.unique(c)) == n * n  # bijective on the face
        order = np.argsort(c)
        oi, oj = ii.ravel()[order], jj.ravel()[order]
        d = np.abs(np.diff(oi)) + np.abs(np.diff(oj))
        assert (d == 1).all()


def test_parent_contains_children():
    c30 = s2.s2_cell(LON, LAT, 30)
    for level in (12, 5, 0):
        p = s2.s2_parent(c30, level)
        lo, hi = s2.s2_range(p)
        assert ((c30 >= lo) & (c30 <= hi)).all()
        # parent of the point == cell of the point at the parent level
        assert (p == s2.s2_cell(LON, LAT, level)).all()


def test_ranges_disjoint_across_sibling_cells():
    c5 = np.unique(s2.s2_cell(LON, LAT, 5))
    lo, hi = s2.s2_range(c5)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    assert (lo[1:] > hi[:-1]).all()  # subtree id ranges never overlap


def test_faces_cover_and_poles_clamp():
    f, i, j = s2.lonlat_to_face_ij(LON, LAT, 30)
    assert set(np.unique(f)) == set(range(6))
    # poles and antimeridian land in valid cells
    edge_lon = np.array([-1800000000, 1799999999, 0, 0], dtype=np.int64)
    edge_lat = np.array([0, 0, 900000000, -900000000], dtype=np.int64)
    ef, ei, ej = s2.lonlat_to_face_ij(edge_lon, edge_lat, 30)
    assert ((ei >= 0) & (ei < 2**30) & (ej >= 0) & (ej < 2**30)).all()
    assert ef[2] == 2 and ef[3] == 5  # north pole on +z, south on -z


def test_st_quadratic_monotone_and_bounded():
    u = np.linspace(-1, 1, 10001)
    st = np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u))
    assert st.min() >= 0 and st.max() <= 1
    assert (np.diff(st) > 0).all()
    assert st[5000] == 0.5  # u=0 -> center
