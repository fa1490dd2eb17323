"""Adversarial invalid-multipolygon corpus — scenario classes ported
from the reference's OSHDBGeometryBuilder tests (self-intersecting
outers: relations/OSHDBGeometryBuilderMultipolygonInvalidOutersTest
.java + invalid-outer-ring.osm; incomplete data:
incomplete/OSHDBGeometryBuilderTestPolygonIncompleteDataTest.java).
The reference repairs via JTS buffer(0) and asserts isValid(); the
repo's ladder (crossing-split + pinch-split + sliver drop +
reorientation) must yield the same observable: simple rings, holes
kept, area preserved."""

import numpy as np

from rayhist.geometry import _shoelace_e7, _split_crossings, build_multipolygon, normalize_ring


def _ring(pts):
    return np.asarray(list(pts) + [pts[0]], dtype=np.int64)


def ring_is_simple(r: np.ndarray) -> bool:
    """Valid ring: closed, >= 3 distinct vertices, no repeated interior
    vertex, no proper edge crossing (the isValid() essentials)."""
    if len(r) < 4 or not np.array_equal(r[0], r[-1]):
        return False
    body = r[:-1]
    if len(np.unique(body, axis=0)) != len(body):
        return False
    return len(_split_crossings(r)) == len(r)  # no vertex inserted


def test_reference_invalid_outer_ring_scenario():
    """The invalid-outer-ring.osm relation: outer way 1 revisits node
    3098431358 (a pinch), outer way 2 is a separate triangle, way 3 is
    an inner inside way 1's main lobe. The build must produce a valid
    multipolygon: every ring simple, the hole placed, nothing lost."""
    n = {  # node id -> (lon_e7, lat_e7), from the .osm fixture
        2384524503: (161317602, 578438818),
        2384524509: (161328349, 578451501),
        2613585539: (161308403, 578441924),
        2613585560: (161327586, 578445134),
        3098430676: (161304822, 578444943),
        3098431358: (161312932, 578438106),
        3098431359: (161324731, 578448328),
    }
    outer1 = np.asarray(
        [n[i] for i in (3098430676, 2384524509, 3098431359, 2613585560,
                        3098431358, 2384524503, 3098431358, 2613585539, 3098430676)],
        dtype=np.int64,
    )
    outer2 = _ring([(0, 0), (10_000_000, 0), (10_000_000, 10_000_000)])
    inner = np.asarray(
        [n[i] for i in (2613585539, 3098431358, 2613585560, 3098431359, 2613585539)],
        dtype=np.int64,
    )
    g = build_multipolygon([outer1, outer2], [inner])
    assert g.kind == "multipolygon"
    # way 1's pinch encloses a zero-area spike (out-and-back through
    # node 2384524503) which buffer(0) erases: the valid result is the
    # de-spiked main lobe + the separate triangle
    assert len(g.parts) == 2
    for px, py in g.parts:
        r = np.stack([np.rint(px * 1e7), np.rint(py * 1e7)], axis=1).astype(np.int64)
        assert ring_is_simple(r)
    assert sum(len(h) for h in g.holes) == 1  # the inner survived
    assert g.area_m2() > 0


def test_bowtie_outer_splits_into_simple_parts():
    """Self-intersecting outer with NO shared vertex (edges cross at a
    non-vertex point): the crossing-split must insert the intersection
    vertex and decompose into simple lobes, preserving total area —
    buffer(0)'s observable on a bowtie."""
    # asymmetric bowtie: (0,0)->(40,0)->(0,30)->(40,30)->close ; edges
    # (40,0)->(0,30) and (40,30)->(0,0) cross at (20,15)
    bow = _ring([(0, 0), (40, 0), (0, 30), (40, 30)])
    pieces = normalize_ring(bow, ccw=True)
    assert len(pieces) == 2
    for p in pieces:
        assert ring_is_simple(p)
        assert _shoelace_e7(p) > 0  # re-oriented CCW
    # area preserved: each lobe is a triangle of base 40, height 15
    total = sum(abs(_shoelace_e7(p)) / 2 for p in pieces)
    assert total == 2 * (40 * 15 / 2)


def test_symmetric_bowtie_not_dropped():
    """A SYMMETRIC bowtie has signed area zero — the pre-round-4 ladder
    dropped it whole as a sliver; with the crossing split it must
    survive as two equal simple triangles."""
    bow = _ring([(0, 0), (20, 0), (0, 20), (20, 20)])
    pieces = normalize_ring(bow, ccw=True)
    assert len(pieces) == 2
    areas = sorted(abs(_shoelace_e7(p)) / 2 for p in pieces)
    assert areas[0] == areas[1] > 0
    for p in pieces:
        assert ring_is_simple(p)


def test_shared_edge_inner_hole_kept():
    """An inner ring sharing a full edge with its outer (touching hole,
    the TestPolygonIncompleteData family's shape) must still be placed
    as a hole — its interior probe point lies inside the outer."""
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    inner = _ring([(0, 0), (40, 0), (40, 40), (0, 40)])  # shares two edges' parts
    g = build_multipolygon([outer], [inner])
    assert g.kind == "multipolygon"
    assert sum(len(h) for h in g.holes) == 1
    full = build_multipolygon([outer], []).area_m2()
    assert 0 < g.area_m2() < full


def test_unclosed_and_degenerate_chains_dropped():
    """Unclosable chains (incomplete relation data) and zero-area
    spikes are dropped without poisoning the valid parts — the
    WayIncompleteData behavior."""
    good = _ring([(0, 0), (50, 0), (50, 50), (0, 50)])
    dangling = np.asarray([(200, 200), (300, 200), (300, 300)], dtype=np.int64)  # open
    spike = _ring([(500, 500), (600, 500)])  # < 3 distinct vertices
    g = build_multipolygon([good, dangling, spike], [])
    assert g.kind == "multipolygon"
    assert len(g.parts) == 1
    r = np.stack([np.rint(g.parts[0][0] * 1e7), np.rint(g.parts[0][1] * 1e7)], axis=1).astype(np.int64)
    assert ring_is_simple(r)


def test_multi_crossing_ring_terminates_and_simplifies():
    """A ring with several proper crossings (spiked star path) must
    decompose into finitely many simple pieces (termination guard for
    the insert-then-pinch loop)."""
    zig = _ring([(0, 0), (60, 0), (0, 40), (60, 40), (0, 80), (60, 80)])
    pieces = normalize_ring(zig, ccw=True)
    assert len(pieces) >= 2
    for p in pieces:
        assert ring_is_simple(p)


# ------------------------------------- review-fix regressions (round 5)


def test_single_outer_attaches_all_inners():
    """One outer: the reference attaches ALL inners unconditionally
    (createPolygon(outer, allInners)) — a dirty inner poking outside
    the outer keeps its hole instead of being dropped."""
    outer = _ring([(0, 0), (100_000, 0), (100_000, 100_000), (0, 100_000)])
    dirty_inner = _ring([(80_000, 40_000), (120_000, 40_000),
                         (120_000, 60_000), (80_000, 60_000)])  # pokes outside
    g = build_multipolygon([outer], [dirty_inner])
    assert g.kind == "multipolygon"
    assert sum(len(h) for h in g.holes) == 1


def test_multi_outer_hole_placement():
    """Multiple outers: an inner attaches to EVERY containing outer;
    a crescent inner in a horseshoe's arm must not punch its hole into
    the small outer sitting in the horseshoe's mouth (the old
    vertex-mean probe landed there)."""
    import numpy as np

    # horseshoe outer B: a U shape (0..300k x 0..300k, mouth at top middle)
    B = _ring([(0, 0), (300_000, 0), (300_000, 300_000), (200_000, 300_000),
               (200_000, 100_000), (100_000, 100_000), (100_000, 300_000),
               (0, 300_000)])
    # small outer A in the mouth
    A = _ring([(130_000, 200_000), (170_000, 200_000),
               (170_000, 240_000), (130_000, 240_000)])
    # U-shaped inner inside B's arms + bottom (its vertex mean lands in
    # the mouth area near A)
    U = _ring([(20_000, 20_000), (280_000, 20_000), (280_000, 280_000),
               (240_000, 280_000), (240_000, 60_000), (60_000, 60_000),
               (60_000, 280_000), (20_000, 280_000)])
    mean = U[:-1].mean(axis=0)
    # sanity: the failure precondition holds — U's vertex mean is NOT
    # inside U itself (it is in the mouth, near/inside A's area)
    from rayhist.geometry import _point_in_ring

    assert not _point_in_ring(float(mean[0]), float(mean[1]), U)
    g = build_multipolygon([A, B], [U])
    assert g.kind == "multipolygon"
    # the hole belongs to B (the horseshoe), not A
    n_holes = [len(h) for h in g.holes]
    outer_sizes = [len(p[0]) for p in g.parts]
    b_idx = outer_sizes.index(max(outer_sizes))  # B has more vertices
    assert n_holes[b_idx] == 1 and sum(n_holes) == 1


def test_shoelace_exact_at_high_longitude():
    """A collinear sliver ring at longitude ~160 degrees must measure
    EXACTLY zero signed area (full-magnitude e7 products exceed 2^53
    and used to leave a nonzero residue, keeping the sliver alive)."""
    import numpy as np

    from rayhist.geometry import _shoelace_e7, normalize_ring

    base = 1_600_000_001
    sliver = np.array([
        [base, 500_000_003],
        [base + 2_000_001, 500_000_003 + 1_000_003],
        [base + 4_000_002, 500_000_003 + 2_000_006],  # collinear
        [base, 500_000_003],
    ], dtype=np.int64)
    assert _shoelace_e7(sliver) == 0.0
    assert normalize_ring(sliver) == []  # sliver dropped
