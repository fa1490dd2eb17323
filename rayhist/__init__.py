"""rayhist — a Ray-Data-native OSM-history analysis engine.

A from-scratch rebuild of the query semantics of OSHDB
(reference: /root/reference, HeiGIT/GIScience OSHDB 0.6.0-SNAPSHOT) on
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- entity-version histories are rows of a table of interleaved
  text+media documents ``(doc_id, spans[])`` (Lance when the ``lance``
  package is present, Parquet otherwise — see ``rayhist.io``);
- the snapshot view (``OSMEntitySnapshotView``) and contribution view
  (``OSMContributionView``) are temporal-interpolation ``map_batches``
  stages (``rayhist.temporal``, ``rayhist.views``);
- a from-scratch spatial engine (``rayhist.spatial``) assigns versions
  to hierarchical grid cells, runs point-in-polygon filtering, kNN and
  raster<->vector joins;
- grouped spatio-temporal aggregation with zerofill lives in
  ``rayhist.aggregate``;
- large-scale training-data operators (dedup, ANN, text analysis,
  sampling, joins) live in ``rayhist.ops``; the ordered/temporal
  family (as-of join, range joins, rolling ROWS/RANGE windows, set
  ops) in ``rayhist.ops.window``; mergeable sketches (t-digest,
  HyperLogLog, Misra-Gries, Bloom) in ``rayhist.functions``.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
session is owned by the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"

# the fluent oshdb-api facade is the primary user entry point
from .api import MapReducer, OSMContributionView, OSMEntitySnapshotView  # noqa: E402

__all__ = ["MapReducer", "OSMContributionView", "OSMEntitySnapshotView", "__version__"]
