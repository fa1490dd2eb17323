"""STR-packed R-tree (spatial/strtree.py) — bulk-load shape, exact
candidate recall vs a linear scan, and backend equivalence with the
grid-bucketed RegionIndex (two indexes, one classify contract)."""

import numpy as np

from rayhist.spatial.join import RegionIndex
from rayhist.spatial.strtree import STRtree, STRtreeRegionIndex

RNG = np.random.default_rng(11)


def _rand_rects(n):
    x0 = RNG.uniform(-1.6e9, 1.5e9, n)
    y0 = RNG.uniform(-0.8e9, 0.7e9, n)
    w = RNG.uniform(1e6, 2e8, n)
    h = RNG.uniform(1e6, 1e8, n)
    return np.stack([x0, y0, x0 + w, y0 + h], axis=1)


def test_query_matches_linear_scan():
    rects = _rand_rects(500)
    tree = STRtree(rects, node_cap=8)
    x = RNG.uniform(-1.8e9, 1.8e9, 2000)
    y = RNG.uniform(-0.9e9, 0.9e9, 2000)
    pid, rid = tree.query_points(x, y)
    got = set(zip(pid.tolist(), rid.tolist()))
    inside = (
        (x[:, None] >= rects[None, :, 0])
        & (y[:, None] >= rects[None, :, 1])
        & (x[:, None] <= rects[None, :, 2])
        & (y[:, None] <= rects[None, :, 3])
    )
    want = set(zip(*(a.tolist() for a in np.nonzero(inside))))
    assert got == want


def test_empty_and_single_rect():
    t0 = STRtree(np.zeros((0, 4)))
    p, r = t0.query_points(np.array([0.0]), np.array([0.0]))
    assert len(p) == 0 and len(r) == 0
    t1 = STRtree(np.array([[0.0, 0.0, 10.0, 10.0]]))
    p, r = t1.query_points(np.array([5.0, 20.0]), np.array([5.0, 20.0]))
    assert p.tolist() == [0] and r.tolist() == [0]


def test_packing_invariants():
    """Every level's node MBR contains all of its children; the level
    sizes shrink by ~node_cap per step."""
    rects = _rand_rects(1000)
    cap = 16
    tree = STRtree(rects, node_cap=cap)
    assert len(tree.levels[-1]) == 1  # single root
    for lvl in range(len(tree.levels) - 1, 0, -1):
        parent, child = tree.levels[lvl], tree.levels[lvl - 1]
        starts = tree.starts[lvl - 1]
        assert len(parent) == (len(child) + cap - 1) // cap
        for k in range(len(parent)):
            c = child[starts[k] : min(starts[k] + cap, len(child))]
            assert parent[k, 0] <= c[:, 0].min() and parent[k, 1] <= c[:, 1].min()
            assert parent[k, 2] >= c[:, 2].max() and parent[k, 3] >= c[:, 3].max()


def _regions():
    regs = []
    for k in range(24):
        x0 = -1.5e9 + k * 1.1e8
        y0 = -6e8 + (k % 5) * 2.2e8
        ring = np.array(
            [[x0, y0], [x0 + 2.5e8, y0], [x0 + 2.5e8, y0 + 2.0e8], [x0, y0 + 2.0e8], [x0, y0]]
        )
        regs.append((f"r{k:02d}", [ring]))
    return regs


def test_backend_equivalence_with_region_index():
    """STRtreeRegionIndex.classify == RegionIndex.classify on
    overlapping regions (same (row, region) containment set)."""
    regs = _regions()
    grid = RegionIndex(regs, zoom=6)
    tree = STRtreeRegionIndex(regs)
    lon = RNG.integers(-1_700_000_000, 1_700_000_000, 5000).astype(np.int64)
    lat = RNG.integers(-850_000_000, 850_000_000, 5000).astype(np.int64)
    a_rows, a_rids = grid.classify(lon, lat)
    b_rows, b_rids = tree.classify(lon, lat)
    a = set(zip(a_rows.tolist(), a_rids.tolist()))
    b = set(zip(b_rows.tolist(), b_rids.tolist()))
    assert a == b and len(a) > 0
