"""Grouped spatio-temporal aggregation — the MapAggregator layer.

Rebuilds the semantics of the reference's ``MapAggregator``
(``oshdb-api/.../MapAggregator.java``, 1044 LoC) on Ray Data:

- ``aggregateBy(indexer)``  -> a groupby key column
- grouped reduce (TreeMap fold + merge, MapAggregator.java:848-869)
  -> ``ds.groupby(keys).aggregate(...)`` — Ray's partial+final hash
  aggregation is exactly the reference's accumulator+combiner split
- ``aggregateByTimestamp`` (MapReducer.java:774-822): snapshot rows
  already carry their snapshot timestamp (``ts_q``); contribution rows
  are binned to the greatest query timestamp <= contribution timestamp
  (``floor_bin``)
- zerofill (MapAggregator.java:870-881, completeZerofill :956-988):
  expected keys absent from the result get identity values; for
  combined indices the FULL CROSS PRODUCT of expected key levels is
  completed. Snapshot views zerofill every query timestamp;
  contribution views all but the last (MapReducer.java:1857-1866).
  Implemented as a driver-side reindex — the aggregated result is
  small by construction (|keys| x |timestamps|), never the raw data.

- ``estimated_quantiles``: per-batch t-digest partials merged on the
  driver (TDigestReducer pattern, partial digests are tiny).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .functions.tdigest import DEFAULT_COMPRESSION, TDigest


def floor_bin(ts: np.ndarray, timestamps: np.ndarray) -> np.ndarray:
    """Greatest query timestamp <= ts (interval binning for the
    contribution view, MapReducer.java:774-822). ts < timestamps[0]
    maps to -1 (caller drops those — they are outside the interval)."""
    timestamps = np.asarray(timestamps, dtype=np.int64)
    ts = np.asarray(ts, dtype=np.int64)
    if len(timestamps) == 0:  # degenerate interval: everything outside
        return np.full(len(ts), -1, dtype=np.int64)
    idx = np.searchsorted(timestamps, ts, side="right") - 1
    return np.where(idx >= 0, timestamps[np.clip(idx, 0, None)], -1)


def zerofill(
    df: pd.DataFrame,
    expected: dict[str, Sequence],
    fill: dict[str, object],
) -> pd.DataFrame:
    """Complete a small aggregated frame with the cross product of
    expected key levels, filling absent cells with identity values."""
    keys = list(expected.keys())
    if len(keys) == 1:
        idx = pd.Index(list(expected[keys[0]]), name=keys[0])
    else:
        idx = pd.MultiIndex.from_product([list(expected[k]) for k in keys], names=keys)
    out = df.set_index(keys).reindex(idx)
    for col, val in fill.items():
        out[col] = out[col].fillna(val)
        if isinstance(val, int):
            out[col] = out[col].astype("int64")
    return out.reset_index().sort_values(keys, kind="mergesort").reset_index(drop=True)


def count_by(
    ds: ray.data.Dataset, keys: list[str], alias: str = "n"
) -> pd.DataFrame:
    """groupby(keys).count() -> small pandas frame (partial+final hash
    aggregation under the hood — the reference's accumulator/combiner
    contract, MapReducer.java:896-1034)."""
    from ray.data.aggregate import Count

    return ds.groupby(keys).aggregate(Count(alias_name=alias)).to_pandas()


def estimated_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: Sequence[float],
    compression: float = DEFAULT_COMPRESSION,
) -> list[float]:
    """estimatedQuantiles (MapReducer.java:1227-1360): one t-digest
    partial per batch, merged on the driver (partials are ~KB)."""

    def partial(batch: pa.Table) -> pa.Table:
        d = TDigest.of(batch[col].to_numpy(zero_copy_only=False), compression)
        return pa.table({"digest": pa.array([d.to_bytes()], type=pa.binary())})

    merged = TDigest(compression)
    for row in ds.map_batches(partial, batch_format="pyarrow").iter_rows():
        merged = merged.merge(TDigest.from_bytes(row["digest"], compression))
    return [merged.quantile(q) for q in qs]


def uniq(ds: ray.data.Dataset, col: str) -> list:
    """Exact distinct (MapReducer.uniq, :1134-1161): per-batch distinct
    partials then a global unique — the set-union combiner expressed as
    two stages so the shuffle only sees pre-deduplicated rows."""
    def batch_distinct(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({col: pc.unique(batch[col])})

    vals = ds.map_batches(batch_distinct, batch_format="pyarrow").unique(col)
    # a null among the distinct values crashes the bare sort (None vs
    # str); SQL DISTINCT keeps NULL as a value — sort it last
    return sorted(vals, key=lambda v: (v is None, v))


def combine_partials(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
) -> pd.DataFrame:
    """Final combine of a pre-aggregated partials Dataset.

    The partials stream is tiny by construction (#blocks x #keys), so
    a Dataset-level groupby would pay a full shuffle's scheduling
    overhead (~seconds) to move a few thousand rows; instead the
    partials are streamed to the driver and combined with one pandas
    groupby — the reference's combiner step (MapAggregator.java:848-869)
    at the driver, exactly like its client-side node-result merge.

    Use ONLY for low-cardinality keys (timestamps, cells at coarse
    zoom, enum values). High-cardinality finals (fine-zoom cells,
    per-document keys) must stay on Dataset.groupby — rule of thumb:
    keys x blocks > ~10^7 rows means keep it distributed.
    """
    df = ds.to_pandas()
    if df.empty and not set(keys) | set(sums) <= set(df.columns):
        # an all-empty partials stream can arrive schema-less (Ray
        # drops empty blocks): return a typed empty result — or, for a
        # global total (no keys), the zero row
        if not keys:
            return pd.DataFrame([{out: 0 for out in sums.values()}]).astype("int64")
        cols = {k: pd.Series([], dtype="object") for k in keys}
        cols.update({out: pd.Series([], dtype="int64") for out in sums.values()})
        return pd.DataFrame(cols)
    if not keys:
        row = pd.DataFrame([{out: df[src].sum() for src, out in sums.items()}])
        for src, out in sums.items():  # ints stay exact int64; floats stay float
            if pd.api.types.is_integer_dtype(df[src].dtype):
                row[out] = row[out].astype("int64")
        return row
    # dropna=False: the Arrow per-batch partials KEEP null-key groups
    # (pa.TableGroupBy semantics, same as SQL GROUP BY) — pandas'
    # default would silently drop them here at the final combine
    g = df.groupby(keys, as_index=False, dropna=False).agg(
        **{out: (src, "sum") for src, out in sums.items()}
    )
    return g


def grouped_estimated_quantiles(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    qs: Sequence[float],
    compression: float = DEFAULT_COMPRESSION,
) -> pd.DataFrame:
    """Grouped estimatedQuantiles (aggregateBy + t-digest,
    MapAggregator.java:378-732): one digest PER KEY per batch, merged
    per key on the driver — the grouped-sketch partial+combine shape
    (sketches are the mergeable-aggregate answer at 10^12 rows; per-key
    partials are ~KB regardless of row count)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        key_type = batch[key].type  # empty batches must keep the key
        # type (a null-typed column would break downstream schema
        # unification)
        df = pd.DataFrame({key: batch[key].to_pylist(), "_v": batch[col].to_numpy(zero_copy_only=False)})
        rows_k, rows_d = [], []
        for k, g in df.groupby(key, sort=True):
            rows_k.append(k)
            rows_d.append(TDigest.of(g["_v"].to_numpy(), compression).to_bytes())
        return pa.table(
            {key: pa.array(rows_k, type=key_type), "digest": pa.array(rows_d, type=pa.binary())}
        )

    merged: dict[object, TDigest] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").iter_rows():
        d = TDigest.from_bytes(row["digest"], compression)
        k = row[key]
        merged[k] = merged[k].merge(d) if k in merged else d
    # int(q*100) truncates float error (0.29*100 -> 28) and collides
    # (0.99 and 0.999 both -> p99); round and refuse collisions
    names = [f"p{round(q * 100)}_est" for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"quantile column names collide: {names} for qs={list(qs)}")
    out = []
    for k in sorted(merged):
        rec = {key: k}
        for q, nm in zip(qs, names):
            rec[nm] = merged[k].quantile(q)
        out.append(rec)
    return pd.DataFrame(out, columns=[key, *names])  # typed-empty safe


def rollup_sums(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_as: str | None = None,
    all_marker: str = "ALL",
    levels: list[list[str]] | None = None,
) -> pd.DataFrame:
    """One-pass GROUPING SETS: aggregates at every requested
    granularity in a SINGLE scan — each batch emits a partial for
    every level (absent key columns set to ``all_marker``), and one
    driver combine folds them (the result is |levels| x |key cross
    product|, tiny by construction). ``levels`` defaults to the
    ROLLUP prefix ladder ``keys[:n], ..., ()``; pass every subset for
    CUBE (``cube_levels(keys)``). The SQL ``GROUP BY
    ROLLUP/CUBE/GROUPING SETS`` with ``coalesce(k, 'ALL')``. Key
    columns must be strings (the marker must be representable); cast
    upstream. ``count_as`` adds a row count per cell."""
    if levels is None:
        levels = [keys[:n] for n in range(len(keys), -1, -1)]
    seen_lvls = set()
    for lvl in levels:
        if not set(lvl) <= set(keys):
            raise ValueError(f"level {lvl} not a subset of keys {keys}")
        sig = tuple(sorted(lvl))
        if sig in seen_lvls:  # a duplicate level would double-count its cells
            raise ValueError(f"duplicate grouping level {lvl}")
        seen_lvls.add(sig)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        for k in keys:  # a genuine marker value would silently merge
            # into the super-aggregate rows — refuse loudly; a NULL
            # key is just as unrepresentable (pandas drops it from
            # fine levels while the grand total includes it, and the
            # coalesce-marker SQL mirror folds it into the marker)
            if df[k].isna().any():
                raise ValueError(f"key column {k!r} contains nulls — "
                                 "fill or filter before rollup/cube")
            if (df[k] == all_marker).any():
                raise ValueError(
                    f"key column {k!r} contains the rollup marker {all_marker!r}"
                )
        if count_as:
            df = df.assign(**{count_as: np.ones(len(df), dtype=np.int64)})
        vals = [*sums.keys(), *([count_as] if count_as else [])]
        outs = []
        for lvl in levels:
            g = (
                df.groupby(lvl, as_index=False)[vals].sum()
                if lvl
                else df[vals].sum().to_frame().T
            )
            for k in keys:
                if k not in lvl:
                    g[k] = all_marker
            outs.append(g[[*keys, *vals]])
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    outmap = dict(sums)
    if count_as:
        outmap[count_as] = count_as
    return combine_partials(partials, keys, outmap)


def pivot_counts(
    ds: ray.data.Dataset,
    row_key: str,
    col_key: str,
    col_values: Sequence,
    prefix: str = "n_",
) -> pd.DataFrame:
    """Pivot a two-key count into a wide matrix: one row per
    ``row_key`` value, one int64 column ``{prefix}{v}`` per expected
    ``col_values`` entry (absent cells zerofilled). The scan stage
    emits per-batch (row, col, n) partials; the reshape happens on the
    combined small frame only. Observed ``col_key`` values OUTSIDE
    ``col_values`` are discarded — the SQL ``PIVOT ... IN (list)``
    contract (the IN-list is an explicit projection, not a filter
    error); pass the full domain to keep every count."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([row_key, col_key]).to_pandas()
        g = df.groupby([row_key, col_key], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n_part"}), preserve_index=False
        )

    long = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        [row_key, col_key],
        {"n_part": "n"},
    )
    wide = long.pivot_table(
        index=row_key, columns=col_key, values="n", aggfunc="sum", fill_value=0
    )
    for v in col_values:
        if v not in wide.columns:
            wide[v] = 0
    wide = wide[list(col_values)].astype("int64")
    wide.columns = [f"{prefix}{v}" for v in col_values]
    return wide.reset_index().sort_values(row_key).reset_index(drop=True)


def grouped_approx_count_distinct(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    p: int | None = None,
) -> pd.DataFrame:
    """Grouped approximate COUNT(DISTINCT col) via per-key HyperLogLog
    partials (functions/hll.py) — the sketch twin of the exact
    ``uniq``/``countUniq`` path, exactly as t-digest is the sketch
    twin of exact quantiles: one fixed-size (2^p B) register array per
    key per batch, merged per key on the driver. At 10^12 rows the
    exact distinct must shuffle every distinct value; this moves
    |keys| x 16 KiB regardless of cardinality. Values are hashed with
    the fmix64-finalized FNV path (register index and rank read
    SPECIFIC bit positions, so the hash must be full-avalanche)."""
    import pyarrow.compute as pc

    from .functions.hll import DEFAULT_P, HLL
    from .ops.text import fmix64, fnv1a_batch

    if p is None:
        p = DEFAULT_P

    def partial(batch: pa.Table) -> pa.Table:
        key_type = batch[key].type
        # COUNT(DISTINCT col) ignores NULL values (a key whose values
        # are ALL null is omitted, like an inner aggregate over the
        # non-null rows); fnv1a_batch would otherwise abort on the
        # first null
        batch = batch.filter(pc.is_valid(batch[col]))
        col_s = pc.cast(batch[col], pa.string())
        h = fmix64(fnv1a_batch(col_s))
        df = pd.DataFrame({key: batch[key].to_pylist(), "_h": h})
        rows_k, rows_s = [], []
        for k, g in df.groupby(key, sort=True):
            rows_k.append(k)
            rows_s.append(HLL.of(g["_h"].to_numpy(dtype=np.uint64), p).to_bytes())
        return pa.table(
            {key: pa.array(rows_k, type=key_type), "hll": pa.array(rows_s, type=pa.binary())}
        )

    merged: dict[object, object] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").iter_rows():
        s = HLL.from_bytes(row["hll"])
        k = row[key]
        merged[k] = merged[k].merge(s) if k in merged else s
    return pd.DataFrame(
        [{key: k, "n_uniq_est": merged[k].count()} for k in sorted(merged)],
        columns=[key, "n_uniq_est"],  # typed-empty safe (callers sort on key)
    )


def cube_levels(keys: list[str]) -> list[list[str]]:
    """All 2^n key subsets (SQL CUBE), coarsest-last for readability."""
    from itertools import combinations

    out = []
    for r in range(len(keys), -1, -1):
        out.extend([list(c) for c in combinations(keys, r)])
    return out


def approx_heavy_hitters(
    ds: ray.data.Dataset, col: str, k: int, top_n: int
) -> pd.DataFrame:
    """Top-n frequent values via mergeable Misra-Gries partials
    (functions/heavyhitters.py): one capacity-k summary per batch
    (at most k (value, count) rows leave each block — never the
    corpus), merged on the driver. EXACT whenever the true distinct
    count <= k (the oracle-checked operating point); above that, every
    item with frequency > n/(k+1) is guaranteed present with bounded
    count error (pinned in tests)."""
    from .functions.heavyhitters import MisraGries

    val_type = None  # preserved from the input schema (not string-only)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # NULL is not a countable value (SQL COUNT/freq semantics),
        # and a None in the Misra-Gries counters crashes its sorted()
        col_v = batch[col].drop_null()
        # C-kernel pre-aggregation: the Python dict work is
        # O(distinct-in-batch), never O(rows)
        vc = pc.value_counts(col_v)
        mg = MisraGries(k)
        mg.add_weighted_items(
            vc.field("values").to_pylist(), vc.field("counts").to_numpy()
        )
        vs, cs = mg.to_items()
        return pa.table(
            {
                "values": pa.array([vs], type=pa.list_(batch[col].type)),
                "counts": pa.array([cs], type=pa.list_(pa.int64())),
            }
        )

    merged = MisraGries(k)
    for row in ds.map_batches(partial, batch_format="pyarrow").iter_rows():
        merged = merged.merge(MisraGries.from_items(k, list(row["values"]), list(row["counts"])))
    out = merged.top(top_n)
    return pd.DataFrame(
        {
            col: [v for v, _ in out],
            "n": np.array([c for _, c in out], dtype=np.int64),
            "rank": np.arange(1, len(out) + 1, dtype=np.int64),
        }
    )


def grouped_mode(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """Exact grouped MODE (most frequent value per key) with a
    deterministic tie-break: the SMALLEST value among the max-count
    ones. Null values are not countable (SQL COUNT semantics); null
    keys form their own group (SQL GROUP BY).

    Shape: per-batch (key, value) pre-counts (C-kernel groupby, rows
    leaving a block = distinct pairs in it) -> ONE hash shuffle on the
    (key, value) pair completes each pair's count inside its bucket ->
    per-bucket argmax PARTIALS per key (legal only because each
    completed pair now appears exactly once globally, making argmax
    associative) -> a <= n_buckets x |keys| driver final. The driver
    never sees the value distribution, only one candidate row per
    (bucket, key)."""
    from .ops.window import _bucket_of, _resolve_buckets

    nb = _resolve_buckets(n_buckets, floor=64)

    def precount(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key: b[key].to_numpy(zero_copy_only=False),
                col: b[col].to_numpy(zero_copy_only=False),
            }
        )
        df = df[df[col].notna()]
        g = df.groupby([key, col], as_index=False, dropna=False).size()
        g = g.rename(columns={"size": "cnt_p"})
        hk = pd.util.hash_array(
            np.asarray(g[key].to_numpy(), dtype=object), categorize=False
        )
        hv = _bucket_of(g[col].to_numpy(), nb).astype(np.uint64)
        g["_bucket"] = ((hk ^ (hv * np.uint64(0x9E3779B97F4A7C15))) % nb).astype(
            np.int64
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_best(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby([key, col], as_index=False, dropna=False)["cnt_p"].sum()
        c = c.sort_values([key, "cnt_p", col], ascending=[True, False, True])
        best = c.groupby(key, as_index=False, dropna=False).first()
        return best.rename(columns={col: "modal_v", "cnt_p": "n_modal"})

    parts = (
        ds.map_batches(precount, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_best, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame(
            {
                key: pd.Series(dtype="object"),
                "modal_v": pd.Series(dtype="int64"),
                "n_modal": pd.Series(dtype="int64"),
            }
        )
    parts = parts.sort_values([key, "n_modal", "modal_v"], ascending=[True, False, True])
    out = parts.groupby(key, as_index=False, dropna=False).first()
    out["n_modal"] = out["n_modal"].astype("int64")
    return out.sort_values(key).reset_index(drop=True)
