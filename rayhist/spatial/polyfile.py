"""Osmosis ``.poly`` boundary-file parsing — the user's own-AOI entry
point (reference: ``oshdb-tool/etl/.../util/PolyFileReader.java``).

Format (one polygon per file):

    region_name
    section1
        lon lat
        lon lat
        ...
    END
    !hole1            <- '!' prefix marks a hole ring
        lon lat
        ...
    END
    END

Coordinates are degrees (floats, scientific notation allowed); rings
need not repeat the first point. ``parse_poly`` returns
``(name, rings_e7)`` where rings_e7 is a list of (n, 2) float64 arrays
in e7 fixed-point space, outer rings first then holes — directly
consumable by ``rayhist.spatial.fip.Polygon`` (even-odd containment
treats holes by ring parity, so ring order does not matter).
"""

from __future__ import annotations

import numpy as np


def parse_poly(text: str) -> tuple[str, list[np.ndarray]]:
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    if not lines:
        raise ValueError("empty .poly file")
    name = lines[0]
    outers: list[np.ndarray] = []
    holes: list[np.ndarray] = []
    i = 1
    while i < len(lines):
        header = lines[i]
        if header == "END":  # file terminator
            break
        is_hole = header.startswith("!")
        i += 1
        pts: list[tuple[float, float]] = []
        while i < len(lines) and lines[i] != "END":
            parts = lines[i].split()
            if len(parts) != 2:
                raise ValueError(f"bad coordinate line in .poly: {lines[i]!r}")
            pts.append((float(parts[0]), float(parts[1])))
            i += 1
        i += 1  # consume section END
        if len(pts) < 3:
            raise ValueError(f"ring {header!r} has fewer than 3 points")
        ring = np.asarray(pts, dtype=np.float64) * 1e7  # degrees -> e7
        (holes if is_hole else outers).append(ring)
    if not outers:
        raise ValueError("no outer ring in .poly file")
    if len(outers) > 1:
        # Osmosis semantics UNION multiple outer sections (Area.add);
        # the downstream even-odd crossing test instead cancels parity
        # where outers OVERLAP — silently wrong AOI answers. Accept
        # multiple outers only when their bboxes are provably disjoint;
        # raise loudly otherwise rather than misclassify.
        boxes = [
            (r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max())
            for r in outers
        ]
        for a in range(len(boxes)):
            for b in range(a + 1, len(boxes)):
                ax0, ay0, ax1, ay1 = boxes[a]
                bx0, by0, bx1, by1 = boxes[b]
                if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                    raise NotImplementedError(
                        ".poly files with OVERLAPPING outer sections need "
                        "union semantics the even-odd test cannot express"
                    )
    return name, outers + holes


def load_poly(path: str) -> tuple[str, list[np.ndarray]]:
    with open(path) as f:
        return parse_poly(f.read())
