"""Fluent MapReducer facade — the oshdb-api user surface on Ray Data.

Mirrors the reference's query-builder chain
(``oshdb-api/.../mapreducer/MapReducer.java``), so a user of

    OSMEntitySnapshotView.on(oshdb)
        .areaOfInterest(bbox)
        .timestamps("2024-01-01", "2024-02-01", "DAILY")
        .osmTag("building", "yes")
        .aggregateByTimestamp()
        .count()

can write the same chain here and get a pandas frame back:

    OSMEntitySnapshotView.on(sf_dir)
        .areaOfInterest(bbox=(x0, y0, x1, y1))
        .timestamps("2024-01-01", "2024-02-01", "DAILY")
        .osmTag("etype", "click")
        .aggregateByTimestamp()
        .count()

Method-for-method parity (reference file:line in each docstring);
execution is NOT a port: every terminal compiles the whole chain into
ONE fused ``map_batches`` stage over the span-document table — decode
(pruned to what the chain reads) + temporal interpolation + filters +
AOI + per-batch partial aggregation — followed by a driver combine of
the tiny partials (the reference's accumulator/combiner split,
MapReducer.java:896-1034, done the Ray Data way). Builders are
immutable: every method returns a NEW MapReducer, so partial chains
can be reused and shared.

Semantic contracts that differ deliberately from the reference:

- ``map`` / ``filter`` / ``osmEntityFilter`` take VECTORIZED
  batch-level callables (``pyarrow.Table -> Table`` / ``-> bool
  ndarray``), not per-row lambdas — a per-row Python callable is the
  one shape that cannot run at 10^12 rows.
- grouped results come back as small pandas DataFrames (the
  reference's ``SortedMap`` analog), scalars as Python numbers.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass, replace

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .temporal import TagFilter


# view columns whose values come from the tag / geometry decode: a
# terminal reading any of these must not prune that decode (the pruned
# decode constant-fills them — see model.decode_spans)
_TAG_COLS = {"tag_sig", "tag_id", "etype", "kk", "is_tag_change"}
_GEOM_COLS = {"lon_e7", "lat_e7", "is_geom_change", "prev_lon_e7", "prev_lat_e7"}
# aggregation keys whose cardinality scales with the corpus: finals on
# these stay distributed (never combine_partials on the driver).
# Per CLAUDE.md: entity ids, distinct users, changesets and the tag
# vocabulary all grow with the corpus
_HIGH_CARD_KEYS = {"osm_id", "doc_id", "uid", "cs", "tag_sig", "tag_id"}


def _to_us(t) -> int:
    from .functions.timeutil import parse_iso

    return parse_iso(t) if isinstance(t, str) else int(t)


@dataclass(frozen=True)
class MapReducer:
    """Immutable query builder; construct via ``OSMEntitySnapshotView
    .on(...)`` / ``OSMContributionView.on(...)``."""

    _view: str  # "snapshot" | "contribution"
    _source: object  # sf_dir str or a span-document Dataset
    _ts: tuple[int, ...] = ()
    _tag_filters: tuple[TagFilter, ...] = ()
    _types: tuple[str, ...] = ()
    _bbox: tuple[int, int, int, int] | None = None
    _rings: tuple | None = None  # ((outer), (hole), ...) e7 coords
    _entity_filters: tuple[Callable, ...] = ()
    # (kind, fn) in CHAIN ORDER — filter/map interleaving is semantic
    # (a filter after a map reads the mapped columns)
    _transforms: tuple[tuple[str, Callable], ...] = ()
    _agg_ts: bool = False
    _agg_cols: tuple[str, ...] = ()
    _regions: tuple = ()  # ((name, (ring, ...)), ...) for aggregateByGeometry
    _timeout_s: float | None = None  # cooperative deadline (timeout())

    # ------------------------------------------------------- settings
    def timestamps(self, *args) -> MapReducer:
        """All reference overloads (MapReducer.java:291-394):
        ``timestamps(iso)``, ``timestamps(start, end, period)``,
        ``timestamps(list_or_args_of_iso_or_us)``. For the contribution
        view the first/last define the half-open interval [t0, tN) and
        the intermediate ones become aggregateByTimestamp bins, as in
        the reference (MapReducer.java:774-822)."""
        def _is_period(s) -> bool:
            from .functions.timeutil import UNITS

            return isinstance(s, str) and (s.upper() in UNITS or s.upper().startswith("P"))

        if len(args) == 3 and all(isinstance(a, str) for a in args) and _is_period(args[2]):
            from .functions.timeutil import timestamps as grid

            ts = grid(*args)
        elif len(args) == 1 and isinstance(args[0], (list, tuple)):
            ts = [_to_us(t) for t in args[0]]
        else:
            ts = [_to_us(t) for t in args]
        return replace(self, _ts=tuple(sorted(set(ts))))  # sorted-set, as OSHDBTimestamps

    def areaOfInterest(
        self, bbox: tuple | None = None, polygon: Sequence | None = None,
        holes: Sequence = (),
    ) -> MapReducer:
        """areaOfInterest (MapReducer.java:242-282). ``bbox`` =
        (lon0, lat0, lon1, lat1) in e7; ``polygon`` = outer ring
        [(lon, lat), ...] in e7 with optional ``holes`` (each a ring).
        Membership for non-convex/holed rings is the even-odd
        crossing-number test (spatial.fip); the entity-level bbox
        prefilter is pushed into the parquet scan either way."""
        if (bbox is None) == (polygon is None):
            raise ValueError("exactly one of bbox= or polygon= required")
        if bbox is not None:
            return replace(self, _bbox=tuple(int(v) for v in bbox), _rings=None)
        rings = (tuple(map(tuple, polygon)),) + tuple(tuple(map(tuple, h)) for h in holes)
        return replace(self, _rings=rings, _bbox=None)

    def osmType(self, *types: str) -> MapReducer:
        """osmType (MapReducer.java:397-408): restrict to
        node/way/relation — pushed into the parquet scan as an
        ``osm_type IN (...)`` row filter AND re-checked on the decoded
        versions (so Dataset sources are filtered too).

        An sf_dir source fans out per type, as the reference's single
        UNION-ALL cell fetch (backend/MapReducerJdbc.java:53-59): nodes
        stream through the fused span chain; way/relation histories go
        through the compound member-recursion tables (rayhist.members /
        members_vec). The compound legs support the snapshot
        ``count()`` terminal (with aggregateByTimestamp /
        aggregateBy('osm_type')); richer chains over way/relation
        raise loudly at the terminal instead of returning a silent 0.

        DEFAULT SCOPE: with NO osmType() call the facade reads the
        NODE span table only (every oracle-pinned chain relies on
        this), whereas the reference's unrestricted MapReducer
        processes all types present in its database — opt into the
        way/relation legs explicitly with
        ``osmType('node', 'way', 'relation')``."""
        if not types:
            # the zero-argument form used to silently CLEAR the
            # restriction back to node-only — reject it instead
            raise ValueError("osmType() needs at least one of node/way/relation")
        ok = {"node", "way", "relation"}
        if not set(types) <= ok:
            raise ValueError(f"osmType must be among {ok}")
        return replace(self, _types=tuple(sorted(set(types))))

    def osmTag(
        self, key: str, value: str | None = None, *,
        values: Sequence[str] | None = None, value_regex: str | None = None,
        exclude: bool = False, exclude_values: Sequence[str] | None = None,
    ) -> MapReducer:
        """All osmTag overloads (MapReducer.java:424-632) plus
        hasTagKeyExcluding (osm/OSMEntity.java:123-137) via
        ``exclude_values``. Multiple calls AND together, as in the
        reference. The collection overload (:595 — match ANY of a set
        of exact tags) takes a list of (key, value) pairs as the sole
        argument: ``osmTag([("building", "yes"), ("amenity", "cafe")])``."""
        if isinstance(key, (list, tuple)):
            if value is not None or values or value_regex or exclude or exclude_values:
                raise ValueError("the collection overload takes no other selectors")
            from .temporal import AnyTagFilter

            tf = AnyTagFilter(tuple((str(k), str(v)) for k, v in key))
            return replace(self, _tag_filters=self._tag_filters + (tf,))
        n_sel = sum(
            x is not None for x in (value, values, value_regex, exclude_values)
        )
        if n_sel > 1:
            raise ValueError(
                "osmTag takes at most ONE of value/values/value_regex/"
                "exclude_values (conflicting selectors would silently narrow)"
            )
        tf = TagFilter(
            key, value,
            tuple(values) if values is not None else None,
            value_regex, exclude,
            tuple(exclude_values) if exclude_values is not None else None,
        )
        return replace(self, _tag_filters=self._tag_filters + (tf,))

    def osmEntityFilter(self, fn: Callable[[pa.Table], np.ndarray]) -> MapReducer:
        """osmEntityFilter (MapReducer.java:411-422): arbitrary
        predicate over entity VERSIONS, vectorized — ``fn(decoded
        version table) -> bool ndarray`` (columns: osm_id, v, ts, cs,
        uid, visible, tag_sig, lon_e7, lat_e7, ...)."""
        return replace(self, _entity_filters=self._entity_filters + (fn,))

    # ------------------------------------------------------ transforms
    def filter(self, fn: Callable[[pa.Table], np.ndarray]) -> MapReducer:
        """filter (MapReducer.java:680-692) over VIEW rows (snapshots /
        contributions), vectorized: ``fn(view table) -> bool ndarray``.
        Applied in CHAIN ORDER relative to map()."""
        return replace(self, _transforms=self._transforms + (("filter", fn),))

    def map(self, fn: Callable[[pa.Table], pa.Table]) -> MapReducer:
        """map (MapReducer.java:647-657), batch-level: ``fn(view
        table) -> table``. Use to add/derive columns for a downstream
        terminal (sum/average/uniq on the new column). Applied in
        CHAIN ORDER relative to filter()."""
        return replace(self, _transforms=self._transforms + (("map", fn),))

    def flatMap(self, fn: Callable[[pa.Table], pa.Table]) -> MapReducer:
        """flatMap (MapReducer.java:665-678): identical contract to
        ``map`` here — the batch-level callable already may return a
        table with more or fewer rows than its input."""
        return self.map(fn)

    # ----------------------------------------------------- aggregation
    def aggregateByTimestamp(self) -> MapReducer:
        """aggregateByTimestamp (MapReducer.java:775-836): snapshot
        rows group by their snapshot timestamp; contribution rows are
        floor-binned to the greatest query timestamp <= contribution
        timestamp. Zerofilled over the full grid (snapshot) / all bins
        (contribution), per MapAggregator.java:870-881."""
        return replace(self, _agg_ts=True)

    def timeout(self, seconds: float) -> MapReducer:
        """Cooperative query timeout (OSHDBDatabase.timeout /
        OSHDBTimeoutException, MapReducerJdbc.java:43-49): the deadline
        is armed when a terminal launches the pipeline and every fused
        batch checks it (Kernels.java:24-36), raising
        RayhistTimeoutError through Ray when exceeded."""
        return replace(self, _timeout_s=float(seconds))

    def aggregateBy(self, col, name: str = "_agg_key") -> MapReducer:
        """aggregateBy (MapReducer.java:735-766) keyed by a view/mapped
        column NAME, or by a custom vectorized indexer ``fn(view
        table) -> array`` (the reference's function-typed overload) —
        the indexer becomes a mapped column named ``name``. Combined
        with aggregateByTimestamp it zerofills the cross product of the
        timestamp grid x observed key levels (completeZerofill,
        MapAggregator.java:956-988)."""
        if callable(col):
            fn = col
            if name in self._agg_cols:
                # two callable indexers defaulting to the same name would
                # append a duplicate column and fail much later with a
                # confusing Arrow duplicate-field error — fail HERE
                raise ValueError(
                    f"aggregateBy: key name {name!r} already in use "
                    f"{tuple(self._agg_cols)}; pass a distinct name= for "
                    "each callable indexer"
                )

            def add_key(t: pa.Table) -> pa.Table:
                return t.append_column(name, pa.array(np.asarray(fn(t))))

            return replace(
                self,
                _transforms=self._transforms + (("map", add_key),),
                _agg_cols=self._agg_cols + (name,),
            )
        if col in self._agg_cols:
            raise ValueError(f"aggregateBy: key {col!r} already in use {tuple(self._agg_cols)}")
        return replace(self, _agg_cols=self._agg_cols + (col,))

    def aggregateByGeometry(self, regions: dict) -> MapReducer:
        """aggregateByGeometry (MapAggregatable.java / MapReducer.java
        :857-888): 1->N expansion of each view row into every region
        containing it (regions may OVERLAP), keyed by ``region_id``.
        ``regions`` maps name -> outer ring [(lon, lat), ...] in e7, or
        (outer, hole, ...) for holed polygons. Membership is the
        general even-odd banded test (spatial.fip); results zerofill
        over ALL region names. For hundreds+ regions prefer the
        compiled actor-pool stage (spatial.fip.PointInPolygonStage) or
        the region-index join (spatial.join)."""
        norm = []
        for name, rings in sorted(regions.items()):
            if rings and not isinstance(rings[0][0], (list, tuple)):
                rings = (rings,)  # a bare outer ring
            norm.append((str(name), tuple(tuple(map(tuple, r)) for r in rings)))
        return replace(
            self, _regions=tuple(norm), _agg_cols=self._agg_cols + ("region_id",)
        )

    def groupByEntity(self) -> MapReducer:
        """groupByEntity (MapReducer.java:707-733) — the aggregation
        analog: subsequent terminals group per osm entity."""
        return self.aggregateBy("osm_id")

    # -------------------------------------------------------- plumbing
    def _interval(self) -> tuple[int, int]:
        if len(self._ts) < 2:
            raise ValueError("contribution view needs >=2 timestamps (interval)")
        return self._ts[0], self._ts[-1]

    def _aoi_prefilter(self):
        """Parquet row filter on the doc-level history bbox columns —
        the OSH pre-filter (the reference prunes at the cell level,
        CellIterator.java:182-195; here the scan itself prunes)."""
        import pyarrow.compute as pc

        flt = None
        box = self._bbox
        if self._rings is not None:
            from .spatial.fip import Polygon

            box = tuple(Polygon([np.asarray(r, float) for r in self._rings]).bbox)
        if box is not None:
            x0, y0, x1, y1 = box
            flt = (
                (pc.field("max_lon_e7") >= int(x0)) & (pc.field("min_lon_e7") <= int(x1))
                & (pc.field("max_lat_e7") >= int(y0)) & (pc.field("min_lat_e7") <= int(y1))
            )
        if self._types:
            tflt = pc.field("osm_type").isin(list(self._types))
            flt = tflt if flt is None else (flt & tflt)
        return flt

    def _compound_types(self) -> tuple[str, ...]:
        """way/relation legs requested over an sf_dir source — these
        stream through the compound member-recursion tables, not the
        fused node-span chain."""
        if not isinstance(self._source, str):
            return ()
        return tuple(t for t in self._types if t != "node")

    def _require_node_only(self, feature: str) -> None:
        if self._compound_types():
            raise NotImplementedError(
                f"{feature} over way/relation types needs the compound "
                "member-recursion engine (rayhist.members_vec); the "
                "fluent three-type union supports count() with "
                "aggregateByTimestamp()/aggregateBy('osm_type') — for "
                "richer way/relation chains see pipelines."
                "q_contrib_type_counts_ways / q_snapshot_way_geoms"
            )

    def _docs(self) -> ray.data.Dataset:
        if not isinstance(self._source, str):
            return self._source
        from . import io as rio
        from .ingest import ensure_documents

        rep = int(os.environ.get("RAYHIST_REP", "1"))
        path = ensure_documents(self._source, rep)
        flt = self._aoi_prefilter()
        return rio.read_table(path, **({"filter": flt} if flt is not None else {}))

    def _aoi_mask_fn(self):
        """Vectorized (lon_e7, lat_e7) -> inside mask, or None."""
        if self._bbox is not None:
            x0, y0, x1, y1 = self._bbox

            def fn(lon, lat):
                return (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)

            return fn
        if self._rings is not None:
            rings = [np.asarray(r, np.float64) for r in self._rings]

            def fn(lon, lat):
                from .spatial.fip import Polygon

                # constructed per task (cheap: band index over the ring
                # edges), shipped as raw arrays in the closure
                return Polygon(rings).contains(
                    lon.astype(np.float64), lat.astype(np.float64)
                )

            return fn
        return None

    def _needs_full_decode(self) -> bool:
        return bool(self._entity_filters or self._transforms)

    def _view_stage(self, need_tags, need_geom):
        """The fused per-batch kernel: decode -> version masks ->
        interpolate/classify -> AOI -> row filters -> maps."""
        from .model import decode_spans
        from .temporal import contributions as contrib_fn
        from .temporal import snapshots as snap_fn

        tag_filters = self._tag_filters
        entity_filters = self._entity_filters
        transforms = self._transforms
        aoi = self._aoi_mask_fn()
        regions = self._regions
        types = self._types
        is_snap = self._view == "snapshot"
        if is_snap and not self._ts:
            # symmetric with the contribution view's _interval() check:
            # a forgotten timestamps() must not return a silent 0
            raise ValueError("snapshot view needs timestamps()")
        ts = np.asarray(self._ts, dtype=np.int64)
        t_from, t_to = (0, 0) if is_snap else self._interval()
        # int-keytable tag filtering: when the caller asks for
        # need_tags="luts" (tag strings would be decoded ONLY for the
        # filters), run the filters as per-version sig-id LUT gathers
        # instead — the direct pipelines' hot path
        # (views.snapshot_counts; osm/OSMEntity.java:97-152 semantics)
        luts = None
        if need_tags == "luts":
            if tag_filters and isinstance(self._source, str):
                from .ingest import sig_keytable

                kt = sig_keytable(self._source)
                luts = [tf.sig_lut(kt) for tf in tag_filters]
                need_tags = "ids"
            else:  # Dataset source has no keytable: string path
                need_tags = bool(tag_filters)

        def stage(batch: pa.Table) -> pa.Table:
            decoded = decode_spans(batch, tags=need_tags, geom=need_geom)
            m = None
            if types:  # exact check (the scan filter is a prefilter)
                import pyarrow.compute as pc

                m = pc.is_in(
                    decoded["osm_type"], value_set=pa.array(list(types))
                ).to_numpy(zero_copy_only=False)
            if luts is not None:
                ids = decoded["tag_id"].to_numpy(zero_copy_only=False)
                for lut in luts:
                    mm = lut[ids]  # id -1 wraps to the trailing no-tags slot
                    m = mm if m is None else (m & mm)
            else:
                for tf in tag_filters:
                    mm = tf.mask(decoded)
                    m = mm if m is None else (m & mm)
            for ef in entity_filters:
                mm = np.asarray(ef(decoded), dtype=bool)
                m = mm if m is None else (m & mm)
            if is_snap:
                out = snap_fn(decoded, ts, m)
                if aoi is not None:
                    keep = aoi(
                        out["lon_e7"].to_numpy(zero_copy_only=False),
                        out["lat_e7"].to_numpy(zero_copy_only=False),
                    )
                    out = out.filter(pa.array(keep))
            else:
                amask = None
                if aoi is not None:
                    amask = aoi(
                        decoded["lon_e7"].to_numpy(zero_copy_only=False),
                        decoded["lat_e7"].to_numpy(zero_copy_only=False),
                    )
                out = contrib_fn(decoded, t_from, t_to, m, aoi=amask)
            for kind, fn in transforms:  # chain order is semantic
                if kind == "filter":
                    out = out.filter(pa.array(np.asarray(fn(out), dtype=bool)))
                else:
                    out = fn(out)
            if regions:
                from .spatial.fip import Polygon

                lon = out["lon_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
                lat = out["lat_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
                if not is_snap and "is_deletion" in out.column_names:
                    # a DELETION's current geometry is the constant-
                    # filled origin; its region membership is where the
                    # entity WAS (prev state) — same rule as the AOI
                    # clipped-empty semantics (temporal.contributions)
                    dele = out["is_deletion"].to_numpy(zero_copy_only=False)
                    lon = np.where(
                        dele,
                        out["prev_lon_e7"].to_numpy(zero_copy_only=False).astype(np.float64),
                        lon,
                    )
                    lat = np.where(
                        dele,
                        out["prev_lat_e7"].to_numpy(zero_copy_only=False).astype(np.float64),
                        lat,
                    )
                parts = []
                for name, rings in regions:
                    inside = Polygon([np.asarray(r, np.float64) for r in rings]).contains(
                        lon, lat
                    )
                    sub = out.filter(pa.array(inside))
                    parts.append(
                        sub.append_column(
                            "region_id",
                            pa.array([name] * len(sub), type=pa.string()),
                        )
                    )
                out = pa.concat_tables(parts)
            return out

        if self._timeout_s is None:
            return stage
        # cooperative deadline, armed when the terminal builds the
        # pipeline (the reference counts from query launch,
        # MapReducerJdbc.java:43-49) and checked between batches
        # (Kernels.java:24-36 isActive())
        from .functions.deadline import Deadline

        deadline = Deadline(self._timeout_s)

        def timed_stage(batch: pa.Table) -> pa.Table:
            deadline.check()
            return stage(batch)

        return timed_stage

    def view(self) -> ray.data.Dataset:
        """Escape hatch: the lazy Dataset of view rows (snapshots or
        contributions) after filters/AOI/maps — for callers composing
        beyond the fluent terminals. Always a FULL decode: these rows
        are user-visible, so no column may be constant-filled (pruning
        belongs to the aggregation terminals, which know what they
        read)."""
        self._require_node_only("view()")
        stage = self._view_stage(need_tags=True, need_geom=True)
        return self._docs().map_batches(stage, batch_format="pyarrow")

    # -------------------------------------------------------- terminals
    def _keys(self) -> list[str]:
        keys = (["ts_q"] if self._agg_ts else []) + list(self._agg_cols)
        if len(set(keys)) != len(keys):
            # e.g. aggregateByGeometry twice, or aggregateByTimestamp()
            # + aggregateBy('ts_q'): duplicate key columns would reach
            # the combine as duplicate labels and fail far downstream
            raise ValueError(
                f"duplicate aggregation keys {keys}: chain each "
                "aggregateBy*/aggregateByGeometry at most once"
            )
        return keys

    @staticmethod
    def _observed_levels(s) -> list:
        """Zerofill levels for one observed key column — SQL GROUP BY
        keeps the NULL group, so a null level joins the cross product
        when present (dropna would silently delete the whole group at
        the reindex)."""
        lv = sorted(s.dropna().unique())
        if s.isna().any():
            lv.append(np.nan)
        return lv

    def _bins(self) -> np.ndarray:
        # contribution aggregateByTimestamp bins = all but the last
        # timestamp (MapReducer.java:1857-1866)
        return np.asarray(self._ts[:-1], dtype=np.int64)

    def _zerofill_ts(self) -> list[int]:
        return list(self._ts) if self._view == "snapshot" else list(self._ts[:-1])

    def _grouped_numeric(self, sums: dict[str, str], count_alias: str | None):
        """Shared count/sum engine: per-batch partial aggregation inside
        the fused stage, driver combine of the tiny partials, zerofill."""
        self._require_node_only("this terminal")
        from .aggregate import combine_partials, floor_bin, zerofill

        keys = self._keys()
        read_cols = set(sums.keys()) | set(self._agg_cols)
        need_full = self._needs_full_decode()
        # prune the decode to what the chain actually reads (the
        # memory-traffic rule — see model.decode_spans)
        if need_full or _TAG_COLS & read_cols:
            need_tags = True
        elif self._tag_filters:
            need_tags = "luts"  # filters only: int-keytable path
        else:
            need_tags = False
        need_geom = need_full or self._aoi_mask_fn() is not None or bool(
            self._regions
        ) or bool(_GEOM_COLS & read_cols)
        view_stage = self._view_stage(need_tags, need_geom)
        agg_ts, is_snap = self._agg_ts, self._view == "snapshot"
        bins = self._bins() if (agg_ts and not is_snap) else None
        src_cols = list(sums.keys())

        def stage(batch: pa.Table) -> pa.Table:
            v = view_stage(batch)
            cols: dict[str, pa.Array] = {}
            if agg_ts:
                tsq = (
                    v["ts_q"].to_numpy(zero_copy_only=False)
                    if is_snap
                    else floor_bin(v["ts"].to_numpy(zero_copy_only=False), bins)
                )
                cols["ts_q"] = pa.array(tsq, type=pa.int64())
            for c in self._agg_cols:
                cols[c] = v[c]
            for c in src_cols:
                cols[c] = v[c].cast(pa.int64()) if pa.types.is_boolean(v[c].type) else v[c]
            cols["_one"] = pa.array(np.ones(len(v), dtype=np.int64))
            t = pa.table(cols)
            aggs = [("_one", "sum")] + [(c, "sum") for c in src_cols]
            if keys:
                g = pa.TableGroupBy(t, keys).aggregate(aggs)
                return g.rename_columns([*keys, "_n_part", *[c + "_part" for c in src_cols]])
            import pyarrow.compute as pc

            out = {"_n_part": pa.array([len(t)], type=pa.int64())}
            for c in src_cols:
                # keep the source type (a float column must not be
                # forced through an int64 cast — that is the grouped
                # path's behavior too)
                typ = t[c].type if pa.types.is_floating(t[c].type) else pa.int64()
                out[c + "_part"] = pa.array([pc.sum(t[c]).as_py() or 0], type=typ)
            return pa.table(out)

        partials = self._docs().map_batches(stage, batch_format="pyarrow")
        outmap = {"_n_part": count_alias or "_n"}
        outmap.update({c + "_part": out for c, out in sums.items()})
        if _HIGH_CARD_KEYS & set(keys):
            # per-entity/per-document keys: the final combine must stay
            # a DISTRIBUTED Dataset groupby (combine_partials' own
            # contract: keys x blocks > ~10^7 rows means keep it
            # distributed — aggregate.py)
            from ray.data.aggregate import Sum

            df = (
                partials.groupby(keys)
                .aggregate(*[Sum(src, alias_name=out) for src, out in outmap.items()])
                .to_pandas()
            )
        else:
            df = combine_partials(partials, keys, outmap)
        if not keys:
            return df  # single-row frame; terminal unwraps
        if self._agg_ts or self._regions:
            expected: dict[str, Sequence] = (
                {"ts_q": self._zerofill_ts()} if self._agg_ts else {}
            )
            region_names = [n for n, _ in self._regions]
            for c in self._agg_cols:  # observed levels (completeZerofill),
                # except region_id which zerofills over ALL regions
                expected[c] = (
                    region_names if c == "region_id" else self._observed_levels(df[c])
                )
            if all(len(v) for v in expected.values()):
                df = zerofill(df, expected, {v: 0 for v in outmap.values()})
        if count_alias is None:
            df = df.drop(columns=["_n"])
        return df.sort_values(keys, kind="mergesort").reset_index(drop=True)

    def _keyed_rows(self, cols: list[str]) -> ray.data.Dataset:
        """Dataset of (group keys..., cols...) view rows — ts binning
        applied, used by the distributed distinct/sketch terminals."""
        self._require_node_only("this terminal")
        from .aggregate import floor_bin

        need_full = self._needs_full_decode()
        read_cols = set(cols) | set(self._agg_cols)  # grouping by a
        # tag/geom column reads it too — pruning it would constant-fill
        # the group key (collapsing every group into one)
        if need_full or _TAG_COLS & read_cols:
            need_tags = True
        elif self._tag_filters:
            need_tags = "luts"
        else:
            need_tags = False
        need_geom = (
            need_full or self._aoi_mask_fn() is not None or bool(self._regions)
            or bool(_GEOM_COLS & read_cols)
        )
        view_stage = self._view_stage(need_tags, need_geom)
        agg_ts, is_snap = self._agg_ts, self._view == "snapshot"
        bins = self._bins() if (agg_ts and not is_snap) else None
        agg_cols = self._agg_cols

        def stage(batch: pa.Table) -> pa.Table:
            v = view_stage(batch)
            out: dict[str, pa.Array] = {}
            if agg_ts:
                tsq = (
                    v["ts_q"].to_numpy(zero_copy_only=False)
                    if is_snap
                    else floor_bin(v["ts"].to_numpy(zero_copy_only=False), bins)
                )
                out["ts_q"] = pa.array(tsq, type=pa.int64())
            for c in agg_cols:
                out[c] = v[c]
            for c in cols:
                if c not in out:
                    out[c] = v[c]
            return pa.table(out)

        return self._docs().map_batches(stage, batch_format="pyarrow")

    def count(self, alias: str = "count"):
        """count (MapReducer.java:1122-1132): scalar, or a frame keyed
        by the aggregation index."""
        if self._compound_types():
            return self._count_compound(alias)
        res = self._grouped_numeric({}, alias)
        return res if self._keys() else int(res[alias].iloc[0])

    def _count_compound(self, alias: str):
        """Three-type union count: the reference's single UNION-ALL
        fetch across node/way/relation cell tables
        (backend/MapReducerJdbc.java:53-59) as ONE fused plan — the
        node leg is the usual pruned span chain, the way/relation legs
        are per-batch member-recursion snapshot counts over their
        compound document tables; all three emit (keys, n_part)
        partials into one combine. Supports the snapshot view with
        aggregateByTimestamp()/aggregateBy('osm_type'); anything the
        compound legs cannot express raises loudly."""
        from .aggregate import combine_partials, zerofill
        from .ingest import read_relation_documents, read_way_documents
        from .members import COMPOUND_BATCH
        from .members import snapshot_geoms_batch as snap_rel_batch
        from .members_vec import snapshot_geoms_batch_vec
        from .model import decode_spans
        from .temporal import snapshots as snap_fn

        if self._view != "snapshot":
            raise NotImplementedError(
                "the three-type union chain supports the snapshot view; "
                "way/relation contributions: pipelines."
                "q_contrib_type_counts_ways / _relations"
            )
        if (
            self._tag_filters or self._entity_filters or self._transforms
            or self._rings or self._bbox is not None or self._regions
            or set(self._agg_cols) - {"osm_type"}
        ):
            self._require_node_only("this filter/transform/key combination")
        if not self._ts:
            raise ValueError("snapshot view needs timestamps()")
        ts_list = [int(t) for t in self._ts]
        ts = np.asarray(ts_list, dtype=np.int64)
        keys = self._keys()
        by_ts, by_type = self._agg_ts, "osm_type" in self._agg_cols
        types = self._types
        # all three corpora must describe the SAME amplification level:
        # the node leg's _docs() reads rep from RAYHIST_REP, so the
        # compound tables must too (a mixed-rep union would sum counts
        # over different corpora in one result frame)
        rep = int(os.environ.get("RAYHIST_REP", "1"))
        # cooperative deadline, same contract as the node-only chain
        # (_view_stage): armed when the terminal builds the plan,
        # checked between batches in EVERY leg
        deadline = None
        if self._timeout_s is not None:
            from .functions.deadline import Deadline

            deadline = Deadline(self._timeout_s)

        def partial(tsq: np.ndarray, otype: str) -> pa.Table:
            cols: dict[str, pa.Array] = {}
            if by_ts:
                u, n = np.unique(tsq, return_counts=True)
            else:
                u, n = np.array([0]), np.array([len(tsq)])
            if by_ts:
                cols["ts_q"] = pa.array(u, type=pa.int64())
            if by_type:
                cols["osm_type"] = pa.array([otype] * len(n), type=pa.string())
            cols["n_part"] = pa.array(n, type=pa.int64())
            return pa.table(cols)

        legs = []
        if "node" in types:

            def node_stage(batch: pa.Table) -> pa.Table:
                if deadline is not None:
                    deadline.check()
                s = snap_fn(decode_spans(batch, tags=False, geom=False), ts)
                return partial(s["ts_q"].to_numpy(zero_copy_only=False), "node")

            legs.append(self._docs().map_batches(node_stage, batch_format="pyarrow"))
        if "way" in types:

            def way_stage(batch: pa.Table) -> pa.Table:
                if deadline is not None:
                    deadline.check()
                s = snapshot_geoms_batch_vec(batch, ts_list)
                return partial(s["ts_q"].to_numpy(zero_copy_only=False), "way")

            legs.append(
                read_way_documents(self._source, rep=rep).map_batches(
                    way_stage, batch_format="pyarrow", batch_size=COMPOUND_BATCH
                )
            )
        if "relation" in types:

            def rel_stage(batch: pa.Table) -> pa.Table:
                if deadline is not None:
                    deadline.check()
                s = snap_rel_batch(batch, ts_list, id_name="rel_id")
                return partial(s["ts_q"].to_numpy(zero_copy_only=False), "relation")

            legs.append(
                read_relation_documents(self._source, rep=rep).map_batches(
                    rel_stage, batch_format="pyarrow", batch_size=COMPOUND_BATCH
                )
            )
        union = legs[0]
        for leg in legs[1:]:
            union = union.union(leg)
        df = combine_partials(union, keys, {"n_part": alias})
        if not keys:
            return int(df[alias].iloc[0])
        expected: dict[str, Sequence] = {}
        if by_ts:
            expected["ts_q"] = ts_list
        if by_type:
            expected["osm_type"] = sorted(types)
        df = zerofill(df, expected, {alias: 0})
        return df.sort_values(keys, kind="mergesort").reset_index(drop=True)

    def sum(self, col: str, alias: str | None = None):
        """sum (MapReducer.java:1097-1120) over a view/mapped column
        (booleans count ``True`` rows, as the reference's map-to-int)."""
        res = self._grouped_numeric({col: alias or f"sum_{col}"}, None)
        if self._keys():
            return res
        v = res[alias or f"sum_{col}"].iloc[0]
        return v.item() if hasattr(v, "item") else v  # Python scalar contract

    def average(self, col: str, alias: str | None = None):
        """average (MapReducer.java:1180-1205): exact integer partials,
        ONE IEEE division at the end (repo money/float rule)."""
        out = alias or f"avg_{col}"
        res = self._grouped_numeric({col: "_s"}, "_c")
        if not self._keys():
            return float(res["_s"].iloc[0] / res["_c"].iloc[0])
        res[out] = res["_s"] / res["_c"].replace(0, np.nan)
        return res.drop(columns=["_s", "_c"])

    def uniq(self, col: str):
        """uniq (MapReducer.java:1134-1161): exact distinct values of a
        view column, distributed (per-batch distinct partials). With an
        aggregation index: a frame of distinct (keys..., col) pairs."""
        keys = self._keys()
        if not keys:
            from .aggregate import uniq as _uniq

            return _uniq(self._keyed_rows([col]), col)
        return (
            self._distinct_pairs(col)
            .select_columns([*keys, col])  # drop Ray's internal count()
            .to_pandas()
            .sort_values([*keys, col], kind="mergesort")
            .reset_index(drop=True)
        )

    def _distinct_pairs(self, col: str) -> ray.data.Dataset:
        """Globally-distinct (keys..., col) rows: per-batch distinct
        partials, ONE groupby shuffle — no O(#distinct) driver pull."""
        keys = self._keys()

        def batch_distinct(batch: pa.Table) -> pa.Table:
            return (
                pa.TableGroupBy(batch, [*keys, col]).aggregate([]).select([*keys, col])
            )

        return (
            self._keyed_rows([col])
            .map_batches(batch_distinct, batch_format="pyarrow")
            .groupby([*keys, col])
            .count()
        )

    def countUniq(self, col: str, alias: str | None = None):
        """countUniq (MapReducer.java:1166-1178). Grouped: blocks after
        the distinct-pair groupby hold globally-unique pairs, so the
        per-key count is a per-batch partial + tiny driver combine."""
        keys = self._keys()
        if not keys:
            # count of the globally-distinct Dataset — never the
            # O(#distinct) driver value pull that len(uniq()) would be
            return int(self._distinct_pairs(col).count())
        from .aggregate import combine_partials, zerofill

        out = alias or f"uniq_{col}"

        def bin_counts(batch: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(batch.select(keys), keys).aggregate([([], "count_all")])
            return g.rename_columns([*keys, "_part"])

        partials = self._distinct_pairs(col).map_batches(
            bin_counts, batch_format="pyarrow"
        )
        if _HIGH_CARD_KEYS & set(keys):
            # per-entity keys: the final stays a distributed groupby
            # (combine_partials' cardinality contract)
            from ray.data.aggregate import Sum

            df = (
                partials.groupby(keys)
                .aggregate(Sum("_part", alias_name=out))
                .to_pandas()
            )
        else:
            df = combine_partials(partials, keys, {"_part": out})
        if self._agg_ts or self._regions:
            expected: dict[str, Sequence] = (
                {"ts_q": self._zerofill_ts()} if self._agg_ts else {}
            )
            region_names = [n for n, _ in self._regions]
            for c in self._agg_cols:
                expected[c] = (
                    region_names if c == "region_id" else self._observed_levels(df[c])
                )
            if all(len(v) for v in expected.values()):
                df = zerofill(df, expected, {out: 0})
        return df.sort_values(keys, kind="mergesort").reset_index(drop=True)

    def estimatedMedian(self, col: str):
        """estimatedMedian (MapReducer.java:1228-1258)."""
        return self.estimatedQuantile(col, 0.5)

    def estimatedQuantile(self, col: str, q: float):
        """estimatedQuantile (MapReducer.java:1261-1293): mergeable
        t-digest partials."""
        r = self.estimatedQuantiles(col, [q])
        return r[0] if isinstance(r, list) else r

    def estimatedQuantiles(self, col: str, qs: Sequence[float]):
        """estimatedQuantiles (MapReducer.java:1296-1333). Grouped (one
        aggregation key): per-key digest partials merged per key —
        MapAggregator.estimatedQuantiles, the grouped-sketch shape."""
        keys = self._keys()
        if not keys:
            from .aggregate import estimated_quantiles

            return estimated_quantiles(self._keyed_rows([col]), col, qs)
        if len(keys) > 1:
            raise NotImplementedError("grouped quantiles support one aggregation key")
        if keys[0] in _HIGH_CARD_KEYS:
            # one driver-side digest PER KEY: corpus-cardinality keys
            # would OOM the driver (the combine_partials contract) —
            # use the distributed exact path instead
            raise NotImplementedError(
                f"estimatedQuantiles by {keys[0]!r} holds one digest per "
                "key on the driver; use "
                "ops.relational.grouped_exact_quantiles_int (distributed)"
            )
        from .aggregate import grouped_estimated_quantiles

        return grouped_estimated_quantiles(self._keyed_rows([col]), keys[0], col, qs)

    def weightedAverage(self, col: str, weight: str, alias: str | None = None):
        """weightedAverage (MapReducer.java:1207-1225): exact integer
        sum(w*x) / sum(w) partials, one IEEE division at the end.
        Integer columns only (the repo money/float rule)."""
        import pyarrow.compute as pc

        mr = self.map(
            lambda t: t.append_column(
                "_wx",
                # checked: a silently wrapped product would return a
                # plausible-looking wrong average
                pc.multiply_checked(t[col].cast(pa.int64()), t[weight].cast(pa.int64())),
            )
        )
        out = alias or f"wavg_{col}"
        res = mr._grouped_numeric({"_wx": "_s", weight: "_w"}, None)
        if not self._keys():
            return float(res["_s"].iloc[0] / res["_w"].iloc[0])
        res[out] = res["_s"] / res["_w"].replace(0, np.nan)
        return res.drop(columns=["_s", "_w"])

    def reduce(self, partial: Callable[[pa.Table], object], combine: Callable):
        """Generic reduce (MapReducer.java:896-1034 accumulator/combiner
        contract): ``partial(view batch) -> partial value`` runs
        distributed, ``combine(a, b)`` folds the per-batch partials on
        the driver (partials must be small — that is the contract)."""

        def stage(batch: pa.Table) -> pa.Table:
            import pickle

            return pa.table(
                {"_p": pa.array([pickle.dumps(partial(batch))], type=pa.binary())}
            )

        import pickle

        acc = None
        for row in self.view().map_batches(stage, batch_format="pyarrow").iter_rows():
            v = pickle.loads(row["_p"])
            acc = v if acc is None else combine(acc, v)
        return acc

    def forEach(self, action: Callable[[pa.Table], None]) -> None:
        """forEach (MapReducer.java:1390-1400), batch-level, on the
        driver via the streaming iterator."""
        for batch in self.stream():
            action(batch)

    def _require_plain_history(self, name: str) -> None:
        """The per-doc history terminals below run over the RAW
        document stream (filters apply per version, which these
        whole-history analyses do not define yet) — raise loudly on
        any configured filter rather than silently ignoring it."""
        if (
            self._tag_filters
            or self._types
            or self._bbox is not None
            or self._rings is not None
            or self._entity_filters
            or self._transforms
        ):
            raise ValueError(
                f"{name} analyses the WHOLE entity history; combine it "
                "with filters via the direct pipelines instead"
            )

    def tagReverts(self) -> pd.DataFrame:
        """Edit-war terminal: per day, versions that revert their
        entity's tags to the state two versions back (A -> B -> A)
        and the distinct entities doing so — the vandalism-analysis
        primitive over the contribution history (pipelines.
        q_tag_reverts' fused lag-2 stage). Contribution view only;
        whole-history (no filters)."""
        if self._view != "contribution":
            raise ValueError("tagReverts() is a contribution-view terminal")
        self._require_plain_history("tagReverts()")
        from .aggregate import combine_partials
        from .pipelines import _revert_stage

        partials = self._docs().map_batches(_revert_stage, batch_format="pyarrow")
        df = combine_partials(
            partials, ["day"], {"n_reverts_p": "n_reverts", "n_entities_p": "n_entities"}
        )
        df = df.astype({"day": "int64", "n_reverts": "int64", "n_entities": "int64"})
        return df.sort_values("day").reset_index(drop=True)

    def lifespans(self) -> pd.DataFrame:
        """Entity-age terminal: the (lifespan_days, deleted) histogram
        from creation to tombstone / window close (pipelines.
        q_entity_lifespans' zero-shuffle stage). Contribution view
        only; whole-history (no filters)."""
        if self._view != "contribution":
            raise ValueError("lifespans() is a contribution-view terminal")
        self._require_plain_history("lifespans()")
        from .aggregate import combine_partials
        from .pipelines import _lifespan_stage

        partials = self._docs().map_batches(_lifespan_stage, batch_format="pyarrow")
        df = combine_partials(
            partials, ["lifespan_days", "deleted"], {"n_entities_p": "n_entities"}
        )
        df = df.astype(
            {"lifespan_days": "int64", "deleted": "int64", "n_entities": "int64"}
        )
        return df.sort_values(["lifespan_days", "deleted"]).reset_index(drop=True)

    def timeWeightedAverageDaily(self) -> pd.DataFrame:
        """Continuous-time terminal: per day, the EXACT integral of
        visible-entity microseconds over the day and its average
        (pipelines._twa_stage — the span-validity model the snapshot
        grid only samples; OSMEntitySnapshot.java's validTo).
        Contribution view only; whole-history (no filters)."""
        if self._view != "contribution":
            raise ValueError(
                "timeWeightedAverageDaily() is a contribution-view terminal"
            )
        self._require_plain_history("timeWeightedAverageDaily()")
        from .pipelines import twa_daily_final

        return twa_daily_final(self._docs())

    def convexHull(self) -> pd.DataFrame:
        """Strict convex hull vertices of the matching snapshot
        positions, PER TIMESTAMP (spatial/hull.py: exact integer
        monotone chain, per-batch local hulls as the combiner) —
        (ts_q, osm_id, lon_e7, lat_e7), one row per hull vertex. A
        target-side geometric terminal (the reference delegates hulls
        to JTS client-side); snapshot view only."""
        if self._view != "snapshot":
            raise ValueError("convexHull() is a snapshot-view terminal")
        from .spatial.hull import grouped_convex_hull

        return grouped_convex_hull(self.view(), "ts_q", "osm_id", "lon_e7", "lat_e7")

    def colocationPairs(self, radius_e7: int) -> pd.DataFrame:
        """All pairs of matching entities within planar distance
        ``radius_e7`` at the (single) snapshot timestamp, with exact
        int64 squared distance (spatial/radius.py grid-partitioned
        self-join) — (id_a, id_b, d2) sorted. Snapshot view with
        exactly ONE timestamp (pairs must not mix timestamps)."""
        if self._view != "snapshot":
            raise ValueError("colocationPairs() is a snapshot-view terminal")
        if len(self._ts) != 1:
            raise ValueError(
                f"colocationPairs() needs exactly one timestamp, got {len(self._ts)}"
            )
        import pyarrow as _pa

        from .spatial.radius import radius_self_join

        pts = self.view().map_batches(
            lambda b: _pa.table(
                {"id": b["osm_id"], "x": b["lon_e7"], "y": b["lat_e7"]}
            ),
            batch_format="pyarrow",
        )
        df = radius_self_join(pts, radius_e7).to_pandas()
        df = df.astype({"id_a": "int64", "id_b": "int64", "d2": "int64"})
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    def collect(self) -> pd.DataFrame:
        """collect (MapReducer.java:1404-1414) — materializes the view
        rows to the driver; small results only, stream() otherwise."""
        return self.view().to_pandas()

    def stream(self, batch_size: int | None = None):
        """stream (MapReducer.java:1422-1430): iterator of Arrow
        batches — the driver never holds the full result."""
        return self.view().iter_batches(batch_format="pyarrow", batch_size=batch_size)


class OSMEntitySnapshotView:
    """OSMEntitySnapshotView.on(...) (oshdb-api/.../OSMEntitySnapshotView.java)."""

    @staticmethod
    def on(source) -> MapReducer:
        return MapReducer("snapshot", source)


class OSMContributionView:
    """OSMContributionView.on(...) (oshdb-api/.../OSMContributionView.java)."""

    @staticmethod
    def on(source) -> MapReducer:
        return MapReducer("contribution", source)
