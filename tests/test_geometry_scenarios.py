"""osm-testdata 7xx multipolygon scenario classes, ported from
OSHDBGeometryBuilderTestOsmTestData7xxTest.java (the reference's
adversarial geometry corpus over osm-testdata/all.osm). Each test
mirrors one scenario CLASS with synthetic e7 coordinates and asserts
the reference's observable: valid decomposition (simple rings, correct
part/hole counts) and exact planar area — never an exception.

Scale note: e7 ints stand in for the fixture's 7.xx/1.xx degree
coordinates; areas are asserted in shoelace units (planar), matching
the reference's intersection-area equality style.
"""

import numpy as np
import pytest

from rayhist.geometry import _shoelace_e7, build_multipolygon, normalize_ring

from .test_geometry_repair import _ring, ring_is_simple


def _area(g):
    """Planar shoelace area of a built multipolygon: parts minus holes
    (e7^2 units)."""
    total = 0.0
    for i, (px, py) in enumerate(g.parts):
        r = np.stack([np.rint(px * 1e7), np.rint(py * 1e7)], axis=1).astype(np.int64)
        total += abs(_shoelace_e7(r)) / 2
        for hx, hy in g.holes[i]:
            h = np.stack([np.rint(hx * 1e7), np.rint(hy * 1e7)], axis=1).astype(np.int64)
            total -= abs(_shoelace_e7(h)) / 2
    return total


def _simple_parts(g):
    for px, py in g.parts:
        r = np.stack([np.rint(px * 1e7), np.rint(py * 1e7)], axis=1).astype(np.int64)
        assert ring_is_simple(r), r
    return len(g.parts)


def test_706_two_outers_touching_in_one_point():
    """test706: two outer rings touching in one point (provided as a
    closed way plus a two-way split ring through the touch point) ->
    a valid 2-part multipolygon."""
    t = (50, 50)
    ring1 = _ring([(0, 0), (50, 0), t, (0, 50)])
    # second ring split into two open ways meeting at t and (100, 100)
    way2 = np.asarray([t, (100, 50), (100, 100)], dtype=np.int64)
    way3 = np.asarray([(100, 100), (50, 100), t], dtype=np.int64)
    g = build_multipolygon([ring1, way2, way3], [])
    assert _simple_parts(g) == 2
    assert _area(g) == 50 * 50 + 50 * 50


def test_709_three_outers_touching_in_three_points():
    """test709: three rings pairwise touching in single points stay
    three separate simple parts."""
    r1 = _ring([(0, 0), (40, 0), (40, 40), (0, 40)])
    r2 = _ring([(40, 0), (80, 0), (80, 40)])  # touches r1 at (40,0)
    r3 = _ring([(40, 40), (80, 80), (0, 80)])  # touches r1 at (40,40)
    g = build_multipolygon([r1, r2, r3], [])
    assert _simple_parts(g) == 3
    assert _area(g) == 40 * 40 + (40 * 40) / 2 + (80 * 40) / 2


def test_710_overlapping_outers_do_not_throw():
    """test710: overlapping outer rings are INVALID input; the
    reference only requires a non-throwing 2-geometry result."""
    r1 = _ring([(0, 0), (60, 0), (60, 60), (0, 60)])
    r2 = _ring([(30, 30), (90, 30), (90, 90), (30, 90)])
    g = build_multipolygon([r1, r2], [])
    assert _simple_parts(g) == 2


def test_711_duplicate_segment_ways():
    """test711: two closed ways sharing one segment (a duplicated
    edge) -> two parts, no exception."""
    sq = _ring([(0, 0), (40, 0), (40, 40), (0, 40)])
    tri = _ring([(0, 0), (40, 0), (20, -30)])  # shares edge (0,0)-(40,0)
    g = build_multipolygon([sq, tri], [])
    assert _simple_parts(g) == 2
    assert _area(g) == 40 * 40 + (40 * 30) / 2


@pytest.mark.parametrize("outer_cw", [False, True])
@pytest.mark.parametrize("inner_cw", [False, True])
def test_720_723_winding_combinations(outer_cw, inner_cw):
    """test720-723: outer/inner rings in every winding combination
    produce the same polygon-with-hole (the builder normalizes
    orientation; roles, not winding, decide outer vs inner)."""
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    inner = _ring([(20, 20), (20, 60), (60, 60), (60, 20)])
    if outer_cw:
        outer = outer[::-1]
    if inner_cw:
        inner = inner[::-1]
    g = build_multipolygon([outer], [inner])
    assert _simple_parts(g) == 1
    assert sum(len(h) for h in g.holes) == 1
    assert _area(g) == 100 * 100 - 40 * 40
    # normalized windings: outers CCW, holes CW
    out_r = np.stack(
        [np.rint(g.parts[0][0] * 1e7), np.rint(g.parts[0][1] * 1e7)], axis=1
    ).astype(np.int64)
    hole_r = np.stack(
        [np.rint(g.holes[0][0][0] * 1e7), np.rint(g.holes[0][0][1] * 1e7)], axis=1
    ).astype(np.int64)
    assert _shoelace_e7(out_r) > 0 and _shoelace_e7(hole_r) < 0


def test_724_member_ways_out_of_order_and_reversed():
    """test724: ring assembly must join member ways given out of order
    and with mixed directions (OSHDBGeometryBuilder.join's flip
    search)."""
    w1 = np.asarray([(0, 0), (50, 0)], dtype=np.int64)
    w2 = np.asarray([(0, 50), (0, 0)], dtype=np.int64)  # reversed
    w3 = np.asarray([(50, 0), (50, 50)], dtype=np.int64)
    w4 = np.asarray([(0, 50), (50, 50)], dtype=np.int64)  # reversed
    g = build_multipolygon([w4, w1, w2, w3], [])
    assert _simple_parts(g) == 1
    assert _area(g) == 50 * 50


def test_729_island_outer_inside_inner_ring():
    """test729: second outer ring nested inside the first outer's
    inner ring (lake island): 2 parts, the hole on the big outer,
    island disjoint from the hole's interior."""
    big = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    lake = _ring([(20, 20), (20, 80), (80, 80), (80, 20)])
    island = _ring([(40, 40), (60, 40), (60, 60), (40, 60)])
    g = build_multipolygon([big, island], [lake])
    assert _simple_parts(g) == 2
    assert sum(len(h) for h in g.holes) == 1
    assert _area(g) == 100 * 100 - 60 * 60 + 20 * 20


def test_741_line_only_outer_is_empty():
    """test741: an unclosable line as the only outer -> empty result
    (Polygonal with zero geometries), no exception."""
    line = np.asarray([(0, 0), (50, 0), (100, 10)], dtype=np.int64)
    g = build_multipolygon([line], [])
    assert g.kind == "empty" or len(g.parts) == 0


def test_744_open_outer_dropped_good_ring_survives():
    """test744: one unclosed outer + one valid ring -> the valid ring
    survives alone."""
    good = _ring([(0, 0), (40, 0), (40, 40), (0, 40)])
    open_way = np.asarray([(200, 200), (260, 200), (260, 260)], dtype=np.int64)
    g = build_multipolygon([good, open_way], [])
    assert _simple_parts(g) == 1
    assert _area(g) == 40 * 40


def test_747_duplicate_consecutive_vertices_repaired():
    """test747/748: a ring carrying the same location twice in
    succession is repaired (duplicate collapsed), stays one simple
    part."""
    dup = np.asarray(
        [(0, 0), (40, 0), (40, 0), (40, 40), (0, 40), (0, 0)], dtype=np.int64
    )
    g = build_multipolygon([dup], [])
    assert _simple_parts(g) == 1
    assert _area(g) == 40 * 40


def test_750_touching_inner_rings_share_edge():
    """test750: two inner rings sharing a full edge are both kept as
    holes; area subtracts each exactly once."""
    outer = _ring([(0, 0), (120, 0), (120, 120), (0, 120)])
    in1 = _ring([(20, 20), (60, 20), (60, 60), (20, 60)])
    in2 = _ring([(60, 20), (100, 20), (100, 60), (60, 60)])  # shares x=60 edge
    g = build_multipolygon([outer], [in1, in2])
    assert _simple_parts(g) == 1
    assert sum(len(h) for h in g.holes) == 2
    assert _area(g) == 120 * 120 - 2 * (40 * 40)


def test_751_touching_inner_rings_share_node():
    """test751: two inner rings sharing a single node."""
    outer = _ring([(0, 0), (120, 0), (120, 120), (0, 120)])
    in1 = _ring([(20, 20), (60, 20), (60, 60), (20, 60)])
    in2 = _ring([(60, 60), (100, 60), (100, 100)])  # touches at (60,60)
    g = build_multipolygon([outer], [in1, in2])
    assert _simple_parts(g) == 1
    assert sum(len(h) for h in g.holes) == 2
    assert _area(g) == 120 * 120 - 40 * 40 - (40 * 40) / 2


def test_755_inner_touching_outer_in_node():
    """test755: inner ring touching the outer ring in one node stays a
    placed hole (probe falls back past boundary vertices)."""
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    inner = _ring([(100, 50), (60, 20), (60, 80)])  # vertex on outer edge
    g = build_multipolygon([outer], [inner])
    assert _simple_parts(g) == 1
    assert sum(len(h) for h in g.holes) == 1
    assert _area(g) == 100 * 100 - (60 * 40) / 2


def test_756_inner_touching_outer_in_line():
    """test756/757: inner ring sharing a boundary LINE with the outer
    still resolves as a hole."""
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    inner = _ring([(100, 20), (100, 80), (50, 50)])  # shares part of x=100
    g = build_multipolygon([outer], [inner])
    assert _simple_parts(g) == 1
    assert sum(len(h) for h in g.holes) == 1
    assert _area(g) == 100 * 100 - (60 * 50) / 2


def test_742_spike_erased():
    """test742: an out-and-back spike on an otherwise valid ring is
    erased by the pinch split (buffer(0)'s observable)."""
    spiky = np.asarray(
        [(0, 0), (40, 0), (40, 40), (40, 90), (40, 40), (0, 40), (0, 0)],
        dtype=np.int64,
    )
    pieces = normalize_ring(spiky, ccw=True)
    assert len(pieces) == 1
    assert ring_is_simple(pieces[0])
    assert abs(_shoelace_e7(pieces[0])) / 2 == 40 * 40


def test_725_concave_outer():
    """test725: valid multipolygon with one CONCAVE outer ring and no
    inner -> one simple part, no holes, exact area."""
    g = build_multipolygon(
        [_ring([(20, 0), (30, 0), (10, 20), (30, 40), (20, 40), (0, 20)])], []
    )
    assert _simple_parts(g) == 1 and g.holes[0] == []
    assert _area(g) == 400


def test_728_node_member_ignored():
    """test728: a relation carrying a NODE member next to a valid outer
    ring — the stray point contributes nothing and must not throw."""
    g = build_multipolygon(
        [_ring([(0, 0), (40, 0), (40, 40), (0, 40)]),
         np.asarray([(100, 100)], dtype=np.int64)],
        [],
    )
    assert _simple_parts(g) == 1
    assert _area(g) == 1600


def test_730_three_inner_rings():
    """test730: one outer + three inner rings with correct roles."""
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    inners = [
        _ring([(10 + i * 30, 10), (20 + i * 30, 10), (20 + i * 30, 20), (10 + i * 30, 20)])
        for i in range(3)
    ]
    g = build_multipolygon([outer], inners)
    assert _simple_parts(g) == 1 and len(g.holes[0]) == 3
    assert _area(g) == 100 * 100 - 3 * 100


def test_731_inner_rings_from_several_ways():
    """test731: complex multipolygon whose INNER rings are each split
    across several open member ways — inner-side ring assembly."""
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    i1a = np.asarray([(10, 10), (30, 10), (30, 30)], dtype=np.int64)
    i1b = np.asarray([(30, 30), (10, 30), (10, 10)], dtype=np.int64)
    i2a = np.asarray([(50, 50), (70, 50)], dtype=np.int64)
    i2b = np.asarray([(70, 50), (70, 70), (50, 70), (50, 50)], dtype=np.int64)
    g = build_multipolygon([outer], [i1a, i1b, i2a, i2b])
    assert _simple_parts(g) == 1 and len(g.holes[0]) == 2
    assert _area(g) == 100 * 100 - 400 - 400


def test_732_two_outers_one_inner_duplicate_vertex():
    """test732: two outer rings, one containing an inner; one ring
    carries the same node twice in succession (repaired away) — the
    inner lands in the RIGHT outer."""
    o1 = np.asarray([(0, 0), (60, 0), (60, 0), (60, 60), (0, 60), (0, 0)], dtype=np.int64)
    o2 = _ring([(100, 100), (140, 100), (140, 140), (100, 140)])
    g = build_multipolygon([o1, o2], [_ring([(20, 20), (40, 20), (40, 40), (20, 40)])])
    assert _simple_parts(g) == 2
    assert sorted(len(h) for h in g.holes) == [0, 1]
    assert _area(g) == 60 * 60 + 40 * 40 - 20 * 20


def test_740_self_crossing_outer_split():
    """test740: INVALID input — the outer ring properly crosses itself
    (bowtie). The repair ladder must split it into simple pieces, never
    throw (the reference catches and degrades)."""
    g = build_multipolygon([_ring([(0, 0), (40, 40), (40, 0), (0, 40)])], [])
    assert _simple_parts(g) == 2
    assert _area(g) == 800


def test_763_four_outers_touching_in_single_point():
    """test763: valid multipolygon of FOUR outer rings all touching in
    one shared node."""
    t = (50, 50)
    outers = [
        _ring([(0, 0), (50, 0), t, (0, 50)]),
        _ring([(100, 0), (100, 50), t, (50, 0)]),
        _ring([(100, 100), (50, 100), t, (100, 50)]),
        _ring([(0, 100), (0, 50), t, (50, 100)]),
    ]
    g = build_multipolygon(outers, [])
    assert _simple_parts(g) == 4
    assert _area(g) == 4 * 50 * 50  # four square quadrants


def test_764_four_inners_touching_in_single_point():
    """test764: one outer + four inner rings touching in a single
    node — the holes stay separate (no merge)."""
    t = (50, 50)
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    inners = [
        _ring([(30, 30), (50, 30), t]),
        _ring([(70, 30), (70, 50), t]),
        _ring([(70, 70), (50, 70), t]),
        _ring([(30, 70), (30, 50), t]),
    ]
    g = build_multipolygon([outer], inners)
    assert _simple_parts(g) == 1 and len(g.holes[0]) == 4
    assert _area(g) == 100 * 100 - 4 * (20 * 20 / 2)


def test_772_two_inners_touching_in_node():
    """test772: two inner rings touching in a single shared node."""
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    inners = [
        _ring([(20, 20), (40, 20), (40, 40), (20, 40)]),
        _ring([(40, 40), (60, 40), (60, 60), (40, 60)]),
    ]
    g = build_multipolygon([outer], inners)
    assert _simple_parts(g) == 1 and len(g.holes[0]) == 2
    assert _area(g) == 100 * 100 - 400 - 400


def test_774_two_outers_touching_in_two_nodes():
    """test774 (GIScience/oshdb#124): two outer rings touching in TWO
    nodes stay two parts."""
    o1 = _ring([(0, 0), (50, 0), (50, 20), (50, 40), (0, 40)])
    o2 = _ring([(50, 0), (100, 0), (100, 40), (50, 40), (50, 20)])
    g = build_multipolygon([o1, o2], [])
    assert _simple_parts(g) == 2
    assert _area(g) == 2 * 50 * 40


def test_745_746_impossible_from_open_ways_empty():
    """test745/746: 'impossible multipolygon' out of one/two open ways
    that never close — empty result, never an exception (the reference
    catches and degrades; no assertion on its invalid data)."""
    g = build_multipolygon([np.asarray([(0, 0), (40, 0), (40, 40)], dtype=np.int64)], [])
    assert g.kind == "empty"
    g = build_multipolygon(
        [np.asarray([(0, 0), (40, 0)], dtype=np.int64),
         np.asarray([(40, 40), (0, 40)], dtype=np.int64)],
        [],
    )
    assert g.kind == "empty"


def test_752_754_invalid_touching_no_common_node_no_throw():
    """test752/754: inners touching each other / the outer along an
    edge WITHOUT a shared vertex — invalid per OGC, but the builder
    must emit simple rings and never throw."""
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    i1 = _ring([(20, 20), (40, 20), (40, 40), (20, 40)])
    i2 = _ring([(40, 25), (60, 25), (60, 35), (40, 35)])  # overlaps i1's edge, no shared vertex
    g = build_multipolygon([outer], [i1, i2])
    assert _simple_parts(g) == 1 and len(g.holes[0]) == 2
    g = build_multipolygon([outer], [_ring([(0, 30), (20, 30), (20, 50), (0, 50)])])
    assert _simple_parts(g) == 1 and len(g.holes[0]) == 1


def test_771_773_touch_point_without_common_node_no_throw():
    """test771/773: outers (resp. inners) touching in a point where
    only ONE ring has a vertex — invalid data; parts stay simple, no
    exception."""
    o1 = _ring([(0, 0), (50, 0), (50, 50), (0, 50)])
    o2 = _ring([(50, 25), (90, 5), (90, 45)])
    g = build_multipolygon([o1, o2], [])
    assert _simple_parts(g) == 2
    outer = _ring([(0, 0), (100, 0), (100, 100), (0, 100)])
    i1 = _ring([(20, 20), (40, 20), (40, 40), (20, 40)])
    i2 = _ring([(40, 30), (60, 20), (60, 40)])
    g = build_multipolygon([outer], [i1, i2])
    assert _simple_parts(g) == 1 and len(g.holes[0]) == 2
