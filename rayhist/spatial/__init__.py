"""From-scratch spatial engine: hierarchical grid, point-in-polygon,
kNN, raster<->vector joins — the Ray-Data replacement for the
reference's XYGrid/ZGrid cells and fip/* indexes."""

from .grid import (  # noqa: F401
    MAXZOOM,
    bbox_cells,
    cell_bounds,
    cell_id,
    insert_zoom,
    pack_cell,
)
