"""Named query pipelines — the ``queries()`` surface of the engine.

Each function takes ``sf_dir`` and returns a small pandas DataFrame
with EXACTLY the column names its DuckDB oracle (rayhist.oracles)
produces. All history pipelines read the span-document table (built
once per sf_dir by rayhist.ingest) and run the fused
decode+interpolate view stages; aggregation results are tiny by
construction, so ``to_pandas`` at the end is driver-safe.

Canonical query constants: the synthetic testdata spans January 2024
(all scale factors), so snapshot timestamps are daily
2024-01-01..2024-02-01 and the contribution interval is
[2024-01-05, 2024-01-25).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Sum

from .aggregate import count_by, floor_bin, zerofill
from .ingest import read_documents
from .spatial.grid import cell_id
from .spatial.knn import knn_points
from .spatial.raster import raster_value_for
from .temporal import TagFilter
from .views import contribution_view, snapshot_view

DAY_US = 86_400_000_000
T0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in unix us
SNAP_DAILY = [T0 + i * DAY_US for i in range(33)]  # Jan 1 .. Feb 2
SNAP_WEEKLY = [T0 + i * DAY_US for i in (0, 7, 14, 21, 28)]
T_MID = T0 + 14 * DAY_US  # 2024-01-15
CONTRIB_FROM = T0 + 4 * DAY_US  # 2024-01-05
CONTRIB_TO = T0 + 24 * DAY_US  # 2024-01-25
CONTRIB_BINS = [T0 + i * DAY_US for i in range(4, 24)]  # daily bins in interval

CELL_ZOOM = 4
RASTER_ZOOM = 6

# convex CCW region polygons in e7 coordinates (mirrored literally in SQL)
REGIONS: dict[str, list[tuple[float, float]]] = {
    "west_rect": [(-1.2e9, -6e8), (-2e8, -6e8), (-2e8, 6e8), (-1.2e9, 6e8)],
    "east_rect": [(2e8, -6e8), (1.2e9, -6e8), (1.2e9, 6e8), (2e8, 6e8)],
    "north_pentagon": [(-4e8, 6.2e8), (4e8, 6.2e8), (6e8, 7.5e8), (0.0, 8.8e8), (-6e8, 7.5e8)],
}


def _docs(sf_dir: str):
    return read_documents(sf_dir)


# ---------------------------------------------------------------- snapshots
def q_snapshot_count_daily(sf_dir: str) -> pd.DataFrame:
    """Snapshot count per daily timestamp, zerofilled (the
    TestHelpersOSMEntitySnapshotView.java:46-87 shape)."""
    snaps = snapshot_view(_docs(sf_dir), SNAP_DAILY)
    df = count_by(snaps, ["ts_q"], alias="n_snapshots")
    return zerofill(df, {"ts_q": SNAP_DAILY}, {"n_snapshots": 0})


def q_snapshot_count_daily_click(sf_dir: str) -> pd.DataFrame:
    """Same, filtered to tag etype=click (osmTag key+value filter)."""
    snaps = snapshot_view(_docs(sf_dir), SNAP_DAILY, TagFilter("etype", "click"))
    df = count_by(snaps, ["ts_q"], alias="n_snapshots")
    return zerofill(df, {"ts_q": SNAP_DAILY}, {"n_snapshots": 0})


def q_snapshot_cells(sf_dir: str) -> pd.DataFrame:
    """Snapshots at weekly timestamps grouped by grid cell (zoom 4) —
    the aggregateBy(cell, timestamp) shuffle."""
    snaps = snapshot_view(_docs(sf_dir), SNAP_WEEKLY)

    def add_cell(batch: pa.Table) -> pa.Table:
        cell = cell_id(
            batch["lon_e7"].to_numpy(zero_copy_only=False),
            batch["lat_e7"].to_numpy(zero_copy_only=False),
            CELL_ZOOM,
        )
        return batch.append_column("cell", pa.array(cell))

    df = count_by(snaps.map_batches(add_cell, batch_format="pyarrow"), ["ts_q", "cell"])
    return df.sort_values(["ts_q", "cell"]).reset_index(drop=True)


def q_snapshot_latest_state(sf_dir: str) -> pd.DataFrame:
    """Full reconstructed state of every visible entity at T_MID."""
    snaps = snapshot_view(_docs(sf_dir), [T_MID])
    df = snaps.to_pandas()[["doc_id", "osm_id", "v", "lon_e7", "lat_e7", "etype", "uid"]]
    return df.sort_values("osm_id").reset_index(drop=True)


# ------------------------------------------------------------ contributions
def _contrib_flags_to_int(batch: pa.Table) -> pa.Table:
    out = batch
    for c in ("is_creation", "is_deletion", "is_tag_change", "is_geom_change"):
        idx = out.schema.get_field_index(c)
        out = out.set_column(idx, c, out[c].cast(pa.int64()))
    return out


def q_contrib_type_counts(sf_dir: str) -> pd.DataFrame:
    """Total contribution counts by type over the interval."""
    ds = contribution_view(_docs(sf_dir), CONTRIB_FROM, CONTRIB_TO)
    ds = ds.map_batches(_contrib_flags_to_int, batch_format="pyarrow")
    row = ds.aggregate(
        Count(alias_name="n_total"),
        Sum("is_creation", alias_name="n_creation"),
        Sum("is_deletion", alias_name="n_deletion"),
        Sum("is_tag_change", alias_name="n_tag_change"),
        Sum("is_geom_change", alias_name="n_geom_change"),
    )
    return pd.DataFrame([row])


def q_contrib_type_counts_click(sf_dir: str) -> pd.DataFrame:
    """Filter-relative contribution counts (tag etype=click): losing
    the tag is a DELETION, regaining it a CREATION
    (CellIterator.java:578-595)."""
    ds = contribution_view(_docs(sf_dir), CONTRIB_FROM, CONTRIB_TO, TagFilter("etype", "click"))
    ds = ds.map_batches(_contrib_flags_to_int, batch_format="pyarrow")
    row = ds.aggregate(
        Count(alias_name="n_total"),
        Sum("is_creation", alias_name="n_creation"),
        Sum("is_deletion", alias_name="n_deletion"),
        Sum("is_tag_change", alias_name="n_tag_change"),
        Sum("is_geom_change", alias_name="n_geom_change"),
    )
    return pd.DataFrame([row])


def q_contrib_daily(sf_dir: str) -> pd.DataFrame:
    """aggregateByTimestamp for contributions: floor-binned daily
    counts, zerofilled over every bin (MapReducer.java:774-822,
    zerofill :1857-1866)."""
    ds = contribution_view(_docs(sf_dir), CONTRIB_FROM, CONTRIB_TO)
    bins = np.asarray(CONTRIB_BINS, dtype=np.int64)

    def add_bin(batch: pa.Table) -> pa.Table:
        b = floor_bin(batch["ts"].to_numpy(zero_copy_only=False), bins)
        batch = batch.append_column("ts_q", pa.array(b))
        return _contrib_flags_to_int(batch)

    agg = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("ts_q")
        .aggregate(Count(alias_name="n_contribs"), Sum("is_creation", alias_name="n_creations"))
        .to_pandas()
    )
    return zerofill(agg, {"ts_q": CONTRIB_BINS}, {"n_contribs": 0, "n_creations": 0})


def q_contrib_uniq_uids_daily(sf_dir: str) -> pd.DataFrame:
    """countUniq of contributor uids per daily bin
    (MapReducer.countUniq, :1165-1168): per-batch distinct partials,
    then an exact distinct-pair groupby."""
    ds = contribution_view(_docs(sf_dir), CONTRIB_FROM, CONTRIB_TO)
    bins = np.asarray(CONTRIB_BINS, dtype=np.int64)

    def pairs(batch: pa.Table) -> pa.Table:
        b = floor_bin(batch["ts"].to_numpy(zero_copy_only=False), bins)
        t = pa.table({"ts_q": pa.array(b), "uid": batch["uid"]})
        # pre-dedup within batch so the shuffle sees fewer rows
        return pa.TableGroupBy(t, ["ts_q", "uid"]).aggregate([]).select(["ts_q", "uid"])

    distinct = count_by(ds.map_batches(pairs, batch_format="pyarrow"), ["ts_q", "uid"], alias="_c")
    out = distinct.groupby("ts_q", as_index=False).size().rename(columns={"size": "n_uids"})
    return zerofill(out, {"ts_q": CONTRIB_BINS}, {"n_uids": 0})


# ----------------------------------------------------------------- spatial
def q_snapshot_pip_regions(sf_dir: str) -> pd.DataFrame:
    """Point-in-polygon semi-join: snapshot points at T_MID against
    the broadcast convex region polygons; count per region,
    zerofilled (the aggregateByGeometry shape,
    MapReducer.java:857-888)."""
    from .spatial.fip import contains_convex

    snaps = snapshot_view(_docs(sf_dir), [T_MID])
    region_items = sorted(REGIONS.items())

    def classify(batch: pa.Table) -> pa.Table:
        lon = batch["lon_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
        lat = batch["lat_e7"].to_numpy(zero_copy_only=False).astype(np.float64)
        rids, counts = [], []
        for rid, ring in region_items:
            inside = contains_convex(np.asarray(ring), lon, lat)
            rids.append(rid)
            counts.append(int(inside.sum()))
        return pa.table({"region_id": pa.array(rids), "n": pa.array(counts, type=pa.int64())})

    partials = snaps.map_batches(classify, batch_format="pyarrow")
    df = partials.groupby("region_id").aggregate(Sum("n", alias_name="n")).to_pandas()
    return zerofill(df, {"region_id": [r for r, _ in region_items]}, {"n": 0})


def q_raster_join(sf_dir: str) -> pd.DataFrame:
    """Raster<->vector join: snapshot points at T_MID keyed by zoom-6
    cell, joined with the synthetic raster band, grouped by band
    value."""
    snaps = snapshot_view(_docs(sf_dir), [T_MID])

    def stage(batch: pa.Table) -> pa.Table:
        cell = cell_id(
            batch["lon_e7"].to_numpy(zero_copy_only=False),
            batch["lat_e7"].to_numpy(zero_copy_only=False),
            RASTER_ZOOM,
        )
        return pa.table(
            {"cell": pa.array(cell), "raster_value": pa.array(raster_value_for(cell))}
        )

    joined = snaps.map_batches(stage, batch_format="pyarrow")
    df = count_by(joined, ["raster_value"], alias="n_points")
    return df.sort_values("raster_value").reset_index(drop=True)


def q_knn(sf_dir: str) -> pd.DataFrame:
    """kNN (k=3) among entity positions at T_MID; queries are the
    entities with osm_id % 17 == 0."""
    snaps = snapshot_view(_docs(sf_dir), [T_MID]).materialize()
    qdf = snaps.to_pandas()[["osm_id", "lon_e7", "lat_e7"]]
    qdf = qdf[qdf["osm_id"] % 17 == 0].sort_values("osm_id")
    queries = list(qdf.itertuples(index=False, name=None))
    out = knn_points(snaps, queries, k=3, id_col="osm_id")
    return out[["query_id", "neighbor_id", "rank", "dist2"]].reset_index(drop=True)


# ------------------------------------------------------------- relational
def q_lineitem_agg(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style grouped aggregate over lineitem; money summed as
    integer cents so sums are order-independent (exact vs oracle)."""
    import ray.data
    from .ops.relational import cents

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        batch = cents(batch, "l_quantity", "qty_c")
        batch = cents(batch, "l_extendedprice", "price_c")
        return cents(batch, "l_discount", "disc_c")

    df = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Count(alias_name="n"),
            Sum("qty_c", alias_name="sum_qty_cents"),
            Sum("price_c", alias_name="sum_price_cents"),
            Sum("disc_c", alias_name="sum_disc_cents"),
        )
        .to_pandas()
    )
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q_orders_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders |x| customer |x| nation (both dimension sides broadcast),
    grouped by nation name."""
    import pyarrow.parquet as pq
    import ray.data
    from .ops.relational import broadcast_join, cents

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    dims = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")[["c_custkey", "n_name"]]
    dims = dims.rename(columns={"c_custkey": "o_custkey"})
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(lambda b: cents(b, "o_totalprice", "price_c"), batch_format="pyarrow")
    joined = broadcast_join(orders, dims, on="o_custkey")
    df = (
        joined.groupby("n_name")
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="sum_price_cents"))
        .to_pandas()
    )
    return df.sort_values("n_name").reset_index(drop=True)


def q_topk_orders(sf_dir: str) -> pd.DataFrame:
    """Top-20 orders by totalprice (deterministic tiebreak on key) —
    per-batch candidates + tiny global reduce, no full sort shuffle."""
    import ray.data
    from .ops.relational import topk

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    out = topk(ds, key="o_totalprice", k=20, tiebreak="o_orderkey")
    return out[["o_orderkey", "o_totalprice"]]


def q_events_by_type(sf_dir: str) -> pd.DataFrame:
    """events grouped by type: row count, distinct users, cents sum."""
    import ray.data
    from .ops.relational import cents

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    ).map_batches(lambda b: cents(b, "value", "value_c"), batch_format="pyarrow")
    base = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="sum_value_cents"))
        .to_pandas()
    )
    uniq_pairs = (
        ds.groupby(["event_type", "user_id"]).count().to_pandas()
        .groupby("event_type", as_index=False).size().rename(columns={"size": "n_users"})
    )
    out = base.merge(uniq_pairs, on="event_type")
    return out.sort_values("event_type").reset_index(drop=True)


def q_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact discrete quartiles of extendedprice cents (value at sorted
    index ((n-1)*q), distributed via value-histogram + cumsum)."""
    import ray.data
    from .ops.relational import cents, exact_quantiles_int

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]).map_batches(
        lambda b: cents(b, "l_extendedprice", "price_c").select(["price_c"]), batch_format="pyarrow"
    )
    p25, p50, p75 = exact_quantiles_int(ds, "price_c", [(1, 4), (1, 2), (3, 4)])
    return pd.DataFrame([{"p25": p25, "p50": p50, "p75": p75}])


def q_tdigest_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """estimatedQuantiles via the from-scratch t-digest (rows-only
    check; accuracy vs exact asserted in tests)."""
    import ray.data
    from .aggregate import estimated_quantiles

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    est = estimated_quantiles(ds, "l_extendedprice", [0.25, 0.5, 0.75])
    return pd.DataFrame([{"p25_est": est[0], "p50_est": est[1], "p75_est": est[2]}])


# ------------------------------------------------------- documents corpus
def q_doc_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus stats: docs, chars, whitespace tokens."""
    import ray.data
    from .ops.text import add_token_count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text", "n_chars"])
    df = (
        ds.map_batches(add_token_count, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Sum("n_tokens", alias_name="sum_tokens"),
        )
        .to_pandas()
    )
    return df.sort_values("source").reset_index(drop=True)


def q_doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """md5 content fingerprint per document (matches SQL md5())."""
    import ray.data
    from .ops.text import fingerprint_stage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = ds.map_batches(fingerprint_stage, batch_format="pyarrow").select_columns(["doc_id", "fp"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_near_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact 3-shingle Jaccard >= 0.5 near-duplicate pairs."""
    import ray.data
    from .ops.dedup import exact_jaccard_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_jaccard_pairs(ds, 1, 2)


def q_minhash_lsh_pairs(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH candidates verified to Jaccard >= 0.5 (rows-only;
    recall vs the exact operator asserted in tests)."""
    import ray.data
    from .ops.dedup import minhash_lsh_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, 1, 2)


def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup pairs, hamming <= 3 (rows-only)."""
    import ray.data
    from .ops.dedup import simhash_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds)


def q_langid(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic + quality scores (rows-only)."""
    import ray.data
    from .ops.text import langid_stage, quality_stage

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = (
        ds.map_batches(quality_stage, batch_format="pandas")
        .map_batches(langid_stage, batch_format="pandas")
        .select_columns(["doc_id", "lang_pred", "stop_ratio", "quality_ok"])
        .to_pandas()
    )
    return df.sort_values("doc_id").reset_index(drop=True)


def q_ann_cosine(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-5 over the embeddings table; queries are
    vec_id % 50 == 0."""
    import ray.data
    from .spatial.knn import ann_cosine_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = ds.select_columns(["vec_id"]).to_pandas()["vec_id"]
    qids = sorted(int(i) for i in ids if i % 50 == 0)
    out = ann_cosine_topk(ds, qids, k=5)
    return out[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
