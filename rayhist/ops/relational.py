"""Relational primitives over Ray Datasets.

These are the generic map/filter/join/aggregate/sort building blocks
(SURVEY.md §2.3/2.7/2.9). Joins follow the broadcast pattern for small
sides (``ray.put`` once, pandas merge per batch — no shuffle); both-
sides-large joins co-partition on a shared bucket key (documented in
rayhist.spatial.raster for the cell-key case).

Money columns are converted to integer cents BEFORE aggregation so
sums are order-independent and bit-equal to the SQL oracles (float
sums are not associative; integer sums are).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _ncpu() -> int:
    """Cluster CPU count (fallback: host cores) — the scaling knob for
    parallelism defaults that must grow with the cluster."""
    import os

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
    return os.cpu_count() or 8


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Round half AWAY from zero — the SQL ``round()`` contract (DuckDB,
    ANSI; C ``round()``). numpy's ``np.round`` is half-to-even and
    ``floor(abs(x)+0.5)`` rounds UP across the integer for values half
    an ulp below .5 (0.49999999999999994+0.5 == 1.0 in IEEE); this
    kernel compares the exact fractional part instead, so it matches
    DuckDB bit-for-bit on every double. Every value->integer derivation
    in the engine uses this function so the rounding contract is pinned
    in one place (mirrored by the oracle SQL's bare ``round()``)."""
    x = np.asarray(x, dtype=np.float64)
    t = np.trunc(x)
    frac = x - t  # exact for |x| < 2^52 (money values always are)
    return t + np.where(np.abs(frac) >= 0.5, np.sign(x), 0.0)


def cents(batch: pa.Table, col: str, out: str) -> pa.Table:
    """round(x*100) as int64 — the exact-sum money representation
    (half-away rounding, matching SQL round()). Null money values are
    rejected loudly: NaN -> int64 is undefined (INT64_MIN on x86) and
    one null row would silently corrupt every downstream cents sum."""
    if batch[col].null_count:
        raise ValueError(
            f"cents: {batch[col].null_count} null value(s) in {col!r} — "
            "money columns must be non-null (filter or fill upstream)"
        )
    v = batch[col].to_numpy(zero_copy_only=False)
    return batch.append_column(out, pa.array(round_half_away(v * 100).astype(np.int64)))


def unpivot(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "name",
    value_name: str = "value",
) -> ray.data.Dataset:
    """SQL UNPIVOT (wide -> long), the inverse of the PIVOT reshape:
    each input row becomes len(value_cols) rows carrying the id
    columns, the source column's name under ``var_name`` and its
    value under ``value_name``. Pure per-batch Arrow kernel — one
    zero-copy column slice plus a dictionary-encoded constant name
    column per measure, concatenated; no shuffle, no row loop, output
    streams at len(value_cols) x the input row count. Value columns
    must share one Arrow type (SQL UNPIVOT's same-type rule) so the
    long column is well-typed; mixed types raise loudly rather than
    silently promoting ints to float."""
    if not value_cols:
        raise ValueError("unpivot: value_cols must be non-empty")

    def fn(batch: pa.Table) -> pa.Table:
        types = {str(batch.schema.field(c).type) for c in value_cols}
        if len(types) > 1:
            raise ValueError(
                f"unpivot: value columns must share one type, got {sorted(types)}"
            )
        ids = [batch[c] for c in id_cols]
        parts = []
        for c in value_cols:
            name = pa.DictionaryArray.from_arrays(
                np.zeros(len(batch), dtype=np.int32), pa.array([c])
            )
            parts.append(
                pa.table(
                    {**dict(zip(id_cols, ids)), var_name: name, value_name: batch[c]}
                )
            )
        return pa.concat_tables(parts).unify_dictionaries()

    return ds.map_batches(fn, batch_format="pyarrow")


_BCAST_CACHE: dict[bytes, pd.DataFrame] = {}


def _broadcast_get(ref) -> pd.DataFrame:
    """Per-worker-process memo of a broadcast ObjectRef: one ray.get /
    unpickle per process, then shared by every task the process runs.
    Capped (FIFO) so long sessions with many distinct dimension tables
    don't accumulate frames in every worker."""
    key = ref.binary()
    val = _BCAST_CACHE.get(key)
    if val is None:
        val = ray.get(ref)
        while len(_BCAST_CACHE) >= 8:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = val
    return val


def broadcast_join(
    ds: ray.data.Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> ray.data.Dataset:
    """Hash join against a broadcast small side: the dimension table is
    put in the object store ONCE and merged per batch (no shuffle) —
    the Ray analog of the reference's denormalize-instead-of-join
    strategy (data-model.md:20-22). ONLY for fixed-size dimension
    tables (nation/region-class); a side that grows with the corpus
    belongs in hash_join. Only ``inner``/``left`` are sound per batch:
    a per-batch ``right``/``outer`` merge would re-emit the small
    side's unmatched rows once PER BATCH."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"broadcast_join: how={how!r} unsupported — per-batch merges "
            "duplicate unmatched small-side rows; use hash_join"
        )
    ref = ray.put(small)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(_broadcast_get(ref), on=on, how=how)

    # TASK pool, not an actor pool: the deserialized small side is
    # memoized per worker PROCESS (_broadcast_get), so the ray.get +
    # unpickle is amortized exactly like an actor's __init__ — without
    # paying actor-pool startup on every execution of the plan
    # (hash_join's schema probe + union executes a side twice; an
    # actor pool re-spun each time cost ~1-2 s per query at sandbox
    # scale). Parallelism follows the scan fan-out, uncapped.
    return ds.map_batches(join, batch_format="pandas")


def topk(ds: ray.data.Dataset, key: str, k: int, tiebreak: str, descending: bool = True) -> pd.DataFrame:
    """Deterministic top-k: per-batch candidate top-k, then a global
    reduce — no full sort shuffle (ds.sort would move every row; this
    moves k rows per batch)."""

    def cand(batch: pa.Table) -> pa.Table:
        df = batch.select([key, tiebreak]).to_pandas()
        df = df.sort_values([key, tiebreak], ascending=[not descending, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    allc = ds.map_batches(cand, batch_format="pyarrow").to_pandas()
    allc = allc.sort_values([key, tiebreak], ascending=[not descending, True], kind="mergesort")
    return allc.head(k).reset_index(drop=True)


def topk_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    key: str,
    k: int,
    tiebreak: str,
    descending: bool = True,
) -> ray.data.Dataset:
    """Deterministic top-k PER GROUP (the windowed
    ``row_number() <= k`` idiom). Two stages, both distributed: a
    per-batch candidate prune keeps at most k rows per group per batch
    (so at most blocks x groups x k rows shuffle — never the corpus),
    then ``groupby(group_col)`` resolves the final k with a 1-based
    ``rank`` column. Ties on ``key`` break by ``tiebreak`` ascending.
    Works at any group cardinality: low-card groups cost a small
    shuffle; high-card groups stay fully distributed."""
    asc = [not descending, True]

    def cand(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, key, tiebreak]).to_pandas()
        df = df.sort_values([key, tiebreak], ascending=asc, kind="mergesort")
        # dropna=False: SQL's PARTITION BY puts NULL groups together
        # and emits up to k of them too — pandas' default silently
        # drops every null-group row at the candidate stage
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False, dropna=False).head(k),
            preserve_index=False,
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, tiebreak], ascending=asc, kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        ds.map_batches(cand, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
    )


def exact_quantiles_int(ds: ray.data.Dataset, col: str, fracs: list[tuple[int, int]]) -> list[int]:
    """Exact discrete quantiles of an integer column: value at sorted
    index ((n-1)*num)//den. Distributed as groupby(value).count() (the
    value-histogram is small relative to the data) + driver cumsum —
    no global sort."""
    hist = ds.groupby(col).count().to_pandas()
    hist = hist[hist[col].notna()].sort_values(col)  # SQL quantiles ignore NULLs
    if hist.empty:
        raise ValueError(f"exact_quantiles_int: no non-null values in {col!r}")
    counts = hist["count()"].to_numpy()
    values = hist[col].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for num, den in fracs:
        idx = ((n - 1) * num) // den  # 0-based rank
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        out.append(int(values[pos]))
    return out


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | list[str],
    n_buckets: int | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """Both-sides-large equi-join: explicit partitioned hash join
    (``how``: inner / left / outer — outer is SQL FULL OUTER;
    ``on``: one key column or a composite key as a list — a row with
    ANY null key component matches nothing, per SQL).

    Each side gets a deterministic ``bucket = key % n_buckets`` column
    (composite keys mix per-column hashes; a single integer key stays
    plain modulo — balanced for id-like keys, salt by raising
    n_buckets);
    the two datasets are unioned with a side marker and co-grouped by
    bucket, and matching buckets are joined pairwise inside
    ``map_groups`` — one shuffle per side, no broadcast. The default
    bucket count SCALES WITH THE CLUSTER (cores x 4, floor 64): a
    constant would make per-bucket memory grow with the corpus until a
    single map_groups task OOMs. Salt hot keys by raising n_buckets.

    Ray >= 2.46 also ships ``Dataset.join``; this explicit form is kept
    because its partitioning is deterministic (resume-stable) and the
    bucket count is an explicit, documented knob.
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"hash_join: how={how!r} unsupported (inner/left/outer)")
    if n_buckets is None:
        n_buckets = max(64, _ncpu() * 4)
    ons = [on] if isinstance(on, str) else list(on)

    # pad both sides to the union schema so the bucket groupby sees
    # one consistent block type
    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    missing = [c for c in ons if c not in lcols or c not in rschema.names]
    if missing:
        raise ValueError(f"hash_join: key columns missing on a side: {missing}")
    rcols = [c for c in rschema.names if c not in ons]
    overlap = (set(lcols) - set(ons)) & set(rcols)
    if overlap:
        # a shared non-key name would collapse in the union-schema dict
        # and come back _x/_y-suffixed from the merge — rename upstream
        raise ValueError(f"hash_join: non-key columns on both sides: {sorted(overlap)}")
    def _pa_type(t):
        # pandas-block sources report NUMPY dtypes (object for text),
        # which pa.nulls / pa.types.is_integer reject — normalize
        if isinstance(t, pa.DataType):
            return t
        return pa.string() if t is object or str(t) == "object" else pa.from_numpy_dtype(t)

    all_fields = [(n, _pa_type(lschema.types[lschema.names.index(n)])) for n in lcols] + [
        (n, _pa_type(rschema.types[rschema.names.index(n)])) for n in rcols
    ]

    def tag_side(side: str, own: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            # SQL join semantics: a NULL key matches nothing. Pandas'
            # merge would match NA==NA, so drop null-key rows at the
            # scan unless the join KEEPS unmatched rows from this side
            # (LEFT keeps left nulls, FULL OUTER keeps both); kept
            # null-key rows are routed around the in-bucket merge
            import pyarrow.compute as pc

            keeps_nulls = how == "outer" or (how == "left" and side == "l")
            if not keeps_nulls:
                valid = pc.is_valid(batch[ons[0]])
                for c in ons[1:]:
                    valid = pc.and_(valid, pc.is_valid(batch[c]))
                batch = batch.filter(valid)
            n = len(batch)
            # composite bucket: mix per-column hashes (h*phi + col);
            # a single integer key degenerates to plain modulo (0*phi
            # + k == k), preserving the documented id-balanced layout
            h = np.zeros(n, dtype=np.uint64)
            for c in ons:
                keys = batch[c].to_numpy(zero_copy_only=False)
                if np.issubdtype(keys.dtype, np.integer):
                    ch = keys.astype(np.uint64)
                elif np.issubdtype(keys.dtype, np.floating):  # kept nulls
                    ch = np.nan_to_num(keys, nan=0.0).astype(np.int64).astype(np.uint64)
                else:
                    ch = pd.util.hash_array(
                        np.asarray(keys, dtype=object), categorize=False
                    ).astype(np.uint64)
                h = h * np.uint64(0x9E3779B97F4A7C15) + ch
            cols = {}
            for name, typ in all_fields:
                cols[name] = batch[name] if name in own else pa.nulls(n, typ)
            cols["_bucket"] = pa.array((h % np.uint64(n_buckets)).astype(np.int64))
            cols["_side"] = pa.array(np.full(n, side, dtype=object), type=pa.string())
            return pa.table(cols)

        return fn

    both = left.map_batches(tag_side("l", lcols), batch_format="pyarrow").union(
        right.map_batches(tag_side("r", [*ons, *rcols]), batch_format="pyarrow")
    )

    # the union-padded nulls would coerce integer columns to float64 in
    # a default arrow->pandas conversion, silently losing int64
    # exactness above 2^53 BEFORE any post-merge restore; take the
    # group as ARROW and map integer columns to pandas nullable Int64
    # instead (exact at any magnitude; money rule: integer cents)
    int_cols = [n for n, t in all_fields if pa.types.is_integer(t)]

    def join_bucket(t: pa.Table) -> pd.DataFrame:
        g = t.to_pandas(
            types_mapper=lambda typ: pd.Int64Dtype() if pa.types.is_integer(typ) else None
        )
        unmatched = None
        if how == "outer":
            # null keys survive a FULL OUTER join unmatched, but pandas
            # merge would pair NaN==NaN across sides — route them around
            # the merge (they are already padded to the union schema)
            nullk = g[ons].isna().any(axis=1)
            if nullk.any():
                unmatched = g[nullk]
                g = g[~nullk]
        lg = g[g["_side"] == "l"][lcols]
        rg = g[g["_side"] == "r"][[*ons, *rcols]]
        out = lg.merge(rg, on=ons, how=how)
        if unmatched is not None:
            out = pd.concat([out, unmatched[list(out.columns)]], ignore_index=True)
        for c in int_cols:
            # all-non-null columns go back to plain int64; columns with
            # genuine nulls (outer joins) STAY nullable Int64 — never
            # float64
            if c in out.columns and out[c].notna().all():
                out[c] = out[c].astype("int64")
        return out

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def hash_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    n_buckets: int | None = None,
    bloom=None,
    anti: bool = False,
) -> ray.data.Dataset:
    """Both-sides-large SEMI-join: keep left rows whose key appears in
    ``right`` (right's other columns and duplicate keys are ignored —
    no row multiplication, unlike an inner ``hash_join`` against a
    non-deduped right side). One co-partitioned shuffle; the in-group
    filter is a vectorized ``isin``. Bucket count scales with the
    cluster like ``hash_join``. Non-integer keys are bucketed via the
    deterministic string hash.

    ``bloom``: optional ``functions.bloom.BloomFilter`` of the RIGHT
    keys (build with ``build_bloom(right, on, expected_distinct)``).
    When set, left batches are pre-pruned in the SCAN stage before the
    shuffle — false positives just ride to the exact in-bucket isin
    (results identical, pinned by test), false negatives are
    impossible, and at low match rates the shuffle moves a fraction of
    the left side. Broadcast once via ``ray.put``.

    ``anti=True`` flips to the ANTI-join (keep left rows whose key
    does NOT appear in right — SQL ``NOT IN`` with non-null keys).
    Bloom pruning is REJECTED for anti-joins: the pre-filter drops
    non-matching rows, which are exactly the anti-join's output."""
    if anti and bloom is not None:
        raise ValueError("bloom pruning is unsound for anti-joins")
    if n_buckets is None:
        n_buckets = max(64, _ncpu() * 4)

    bloom_ref = ray.put(bloom) if bloom is not None else None

    lcols = list(left.schema().names)

    def _buckets(keys: np.ndarray) -> np.ndarray:
        if np.issubdtype(keys.dtype, np.integer):
            return (keys.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        return (
            pd.util.hash_array(np.asarray(keys, dtype=object), categorize=False)
            % n_buckets
        ).astype(np.int64)

    def tag_left(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # SQL `k IN (...)` / `k NOT IN (...)` evaluates to unknown for
        # a NULL k -> the row is dropped in BOTH modes (pandas' isin
        # would instead match NaN==NaN and keep it)
        batch = batch.filter(pc.is_valid(batch[on]))
        if bloom_ref is not None:
            bf = ray.get(bloom_ref)
            batch = batch.filter(pa.array(bf.contains(batch[on])))
        keys = batch[on].to_numpy(zero_copy_only=False)
        t = batch.append_column("_bucket", pa.array(_buckets(keys)))
        return t.append_column("_side", pa.array(np.ones(len(batch), dtype=np.int8)))

    ltypes = list(left.schema().types)

    def tag_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null right keys never match any left key in SQL — drop them
        # (the anti docstring's non-null contract covers the NOT IN
        # any-null-empties-the-result corner)
        batch = batch.filter(pc.is_valid(batch[on]))
        keys = batch[on].to_numpy(zero_copy_only=False)
        n = len(batch)
        cols = {on: batch[on]}
        for c, typ in zip(lcols, ltypes):
            if c == on:
                continue
            # pad integer columns with ZEROS, not nulls: a single null
            # coerces the whole pandas group block to float64, silently
            # losing int64 exactness above 2^53 (right rows are dropped
            # by the filter, so the sentinel never escapes)
            if pa.types.is_integer(typ):
                cols[c] = pa.array(np.zeros(n, dtype=np.int64), type=typ)
            else:
                cols[c] = pa.nulls(n, typ)
        t = pa.table(cols).select(lcols)
        t = t.append_column("_bucket", pa.array(_buckets(keys)))
        return t.append_column("_side", pa.array(np.zeros(n, dtype=np.int8)))

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 1]
        seen = g.loc[g["_side"] == 0, on].unique()
        keep = lg[on].isin(seen)
        return lg[~keep if anti else keep][lcols]

    return both.groupby("_bucket").map_groups(filter_bucket, batch_format="pandas")


def deterministic_sample(
    ds: ray.data.Dataset,
    rate_num: int,
    rate_den: int,
    key_col: str,
    hash_fn: str = "fnv1a",
) -> ray.data.Dataset:
    """Deterministic, resume-stable corpus sampling: keep a row iff the
    top 32 bits of hash(key) fall under ``rate_num/rate_den`` of the
    hash space (integer threshold — exact in every engine). The sample
    is a pure function of the key, so it is identical across runs,
    partitionings and parallelism levels, and NESTED: a lower-rate
    sample is always a subset of a higher-rate one (re-sampling an
    existing sample at a lower rate equals sampling the corpus at that
    lower rate directly — rates nest, they do not multiply).

    ``hash_fn``:
    - ``"fnv1a"`` (default, the production path): vectorized 64-bit
      FNV-1a over the key bytes (ops.text.fnv1a_batch) + the murmur
      fmix64 finalizer — FNV alone under-mixes the top bits of short
      keys (measured: a nominal 1/2 sample kept 98% of small-int doc
      ids), and the threshold reads the top 32 bits. No per-row
      Python in the hot filter.
    - ``"md5"``: per-row hashlib, bit-mirrorable in SQL
      (``('0x' || substr(md5(k),1,8))::UBIGINT < thresh``) — used by
      the oracle-checked twin; at corpus scale prefer fnv1a.
    """
    thresh = (rate_num << 32) // rate_den

    if hash_fn == "md5":
        import hashlib

        def stage(b: pa.Table) -> pa.Table:
            keys = b[key_col].to_pylist()
            mask = [
                int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) < thresh
                for k in keys
            ]
            return b.filter(pa.array(mask, type=pa.bool_()))

    else:

        def stage(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from .text import fmix64, fnv1a_batch

            col = b[key_col]
            # C-kernel cast (int/decimal -> same digits as str());
            # fnv1a_batch reads the utf-8 buffer directly. Nulls map
            # to "None" (the legacy str() name) via fill_null so a
            # key's hash NEVER depends on whether a null co-resides in
            # its block (an all-str() fallback formatted bool/timestamp
            # keys differently in null-bearing blocks, breaking the
            # partitioning-invariance contract)
            keys = pc.cast(col, pa.string())
            if col.null_count:
                keys = pc.fill_null(keys, "None")
            h = fmix64(fnv1a_batch(keys)) >> np.uint64(32)  # top 32 bits
            return b.filter(pa.array(h < np.uint64(thresh)))

    return ds.map_batches(stage, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    rates: dict,
    key_col: str,
    stratum_col: str,
    hash_fn: str = "fnv1a",
    default: tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Deterministic STRATIFIED sampling: per-stratum keep rates
    (``rates[stratum] = (num, den)``), decided by the same hash
    threshold as ``deterministic_sample`` — resume-stable,
    partitioning/parallelism-invariant, and NESTED per stratum (a
    lower rate is a subset of a higher one), so rebalancing a corpus
    by source never resamples disjoint rows. Strata absent from
    ``rates`` use ``default`` (None = drop — an explicit whitelist).
    The threshold lookup is a vectorized map; the hash is computed
    once per row regardless of stratum count."""
    thresh = {
        s: np.uint64((num << 32) // den) for s, (num, den) in rates.items()
    }
    dflt = np.uint64((default[0] << 32) // default[1]) if default else np.uint64(0)

    if hash_fn == "md5":
        import hashlib

        def hashes(keys_col) -> np.ndarray:
            return np.array(
                [
                    int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
                    for k in keys_col.to_pylist()
                ],
                dtype=np.uint64,
            )

    else:

        def hashes(keys_col) -> np.ndarray:
            import pyarrow.compute as pc

            from .text import fmix64, fnv1a_batch

            # same block-layout-invariant formatting rule as
            # deterministic_sample: cast for values, "None" for nulls
            keys = pc.cast(keys_col, pa.string())
            if keys_col.null_count:
                keys = pc.fill_null(keys, "None")
            return fmix64(fnv1a_batch(keys)) >> np.uint64(32)

    def stage(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = hashes(b[key_col])
        # O(distinct strata) Python, vectorized gather per row — the
        # factorization is Arrow's dictionary_encode (no per-row
        # Python object materialization in the hot filter)
        col = b[stratum_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        categories = enc.dictionary.to_pylist()
        lut = np.array(
            [thresh.get(s, dflt) for s in categories], dtype=np.uint64
        )
        # null stratum -> code -1, which would wrap to the LAST
        # category's threshold; route it to the default rate instead.
        # An ALL-null block has no categories at all — every row is a
        # null stratum and must take the same default rate (a zero
        # threshold here would make sampling depend on which rows
        # co-reside in a block, breaking partitioning invariance)
        if len(lut):
            t = np.where(codes >= 0, lut[np.maximum(codes, 0)], dflt)
        else:
            t = np.full(len(b), dflt, dtype=np.uint64)
        return b.filter(pa.array(h < t))

    return ds.map_batches(stage, batch_format="pyarrow")


def grouped_exact_quantiles_int(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    fracs: list[tuple[int, int]],
    names: list[str],
) -> pd.DataFrame:
    """Exact discrete quantiles of an integer column PER GROUP (value
    at sorted index ((n-1)*num)//den within each key) — no global or
    per-group row sort: a distributed (key, value) histogram groupby,
    then a per-key cumsum resolve, also distributed. Driver receives
    |keys| rows."""

    hist = ds.groupby([key, col]).count()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        empty = g.iloc[:0]
        g = g[g[col].notna()]  # SQL quantiles ignore NULL values
        if g.empty:  # all-null group: emit nothing, dtype-preserving
            return pd.DataFrame(
                {key: empty[key],
                 **{nm: pd.Series([], dtype="int64") for nm in names}}
            )
        g = g.sort_values(col)
        cum = g["count()"].to_numpy().cumsum()
        vals = g[col].to_numpy()
        n = int(cum[-1])
        rec = {key: g[key].iloc[0]}
        for (num, den), name in zip(fracs, names):
            idx = ((n - 1) * num) // den
            rec[name] = int(vals[int(np.searchsorted(cum, idx + 1, side="left"))])
        return pd.DataFrame([rec])

    return (
        hist.groupby(key)
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )


def grouped_median_mad_int(
    ds: ray.data.Dataset, key: str, col: str
) -> pd.DataFrame:
    """Exact discrete median AND median-absolute-deviation per group
    from ONE distributed (key, value) histogram: each key's complete
    histogram lands in one map_groups task, where the median resolves
    by cumsum rank and the deviation histogram |v - med| (re-binned by
    summing the counts of v = med-d and med+d) resolves the MAD the
    same way — no second scan of the corpus, no broadcast round-trip.
    Rank rule is the discrete (n-1)//2 selection on both passes.
    Null values are dropped BEFORE the shuffle (SQL semantics, and
    Ray's groupby cannot hash pandas NA keys)."""

    def drop_null_vals(b: pa.Table) -> pa.Table:
        return b.filter(pa.compute.is_valid(b[col]))

    hist = (
        ds.map_batches(drop_null_vals, batch_format="pyarrow")
        .groupby([key, col])
        .count()
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[col].notna()]
        if g.empty:
            return pd.DataFrame(
                {key: pd.Series([], dtype=object),
                 "med": pd.Series([], dtype="int64"),
                 "mad": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(col)
        vals = g[col].to_numpy(dtype=np.int64)
        cnts = g["count()"].to_numpy(dtype=np.int64)
        cum = cnts.cumsum()
        n = int(cum[-1])
        med = int(vals[int(np.searchsorted(cum, (n - 1) // 2 + 1, side="left"))])
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        dcum = cnts[order].cumsum()
        mad = int(dev[order][int(np.searchsorted(dcum, (n - 1) // 2 + 1, side="left"))])
        return pd.DataFrame([{key: g[key].iloc[0], "med": med, "mad": mad}])

    return (
        hist.groupby(key)
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )


def _skyline_mask_2d(maxv: np.ndarray, minv: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2D Pareto frontier under STRICT
    dominance: row A is dominated iff some row B has maxv >= / minv <=
    with at least one strict — duplicate points all survive. Sorted
    sweep: a row survives iff its minv equals its maxv-level's minimum
    AND beats the running minimum of every strictly-higher maxv level."""
    order = np.lexsort((minv, -maxv))
    p, d = maxv[order], minv[order]
    new_level = np.r_[True, p[1:] != p[:-1]]
    lvl_idx = np.cumsum(new_level) - 1
    lvl_min = d[new_level]  # minv asc within a level: first row is the level min
    higher_min = np.concatenate(
        [[np.iinfo(np.int64).max], np.minimum.accumulate(lvl_min)[:-1]]
    )
    keep_sorted = (d == lvl_min[lvl_idx]) & (d < higher_min[lvl_idx])
    keep = np.zeros(len(maxv), dtype=bool)
    keep[order] = keep_sorted
    return keep


def pareto_front_2d(
    ds: ray.data.Dataset,
    group_col: str,
    max_col: str,
    min_col: str,
) -> ray.data.Dataset:
    """Per-group 2D Pareto frontier (skyline): the rows not strictly
    dominated within their group (``max_col`` maximized, ``min_col``
    minimized; both int64 — exact compares). Distributed as a
    block-local frontier prefilter (sound combiner: a row dominated
    inside its own block is dominated in the union, so
    frontier(∪blocks) ⊆ ∪ block-frontiers) followed by one
    groupby(group) final — only block-frontier rows shuffle, never the
    corpus. The SQL mirror is the classic NOT EXISTS anti-self-join."""

    def local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keep = np.zeros(len(df), dtype=bool)
        for _, idx in df.groupby(group_col, sort=False).indices.items():
            sub = df.iloc[idx]
            keep[idx] = _skyline_mask_2d(
                sub[max_col].to_numpy(dtype=np.int64),
                sub[min_col].to_numpy(dtype=np.int64),
            )
        return pa.Table.from_pandas(df[keep], preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        keep = _skyline_mask_2d(
            g[max_col].to_numpy(dtype=np.int64), g[min_col].to_numpy(dtype=np.int64)
        )
        return g[keep]

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
    )


def grouped_weighted_median_int(
    ds: ray.data.Dataset, keys: list[str], col: str, weight: str
) -> pd.DataFrame:
    """Exact LOWER weighted median per group of an int64 ``col``
    weighted by int64 ``weight``: the smallest value whose cumulative
    weight reaches half the group total (2*cw >= tw — the SQL
    cumulative-weight window idiom). Distributed as a per-batch
    (keys, value) weight pre-aggregation (bounds the shuffle at
    distinct values per block, never raw rows) -> one
    groupby(keys, value).sum -> per-group sorted cumsum in map_groups;
    only |groups| rows reach the driver. Zero and negative weights are
    rejected loudly (a zero-weight value could otherwise BE the median
    while contributing nothing)."""

    def prag(b: pa.Table) -> pa.Table:
        w = b[weight].to_numpy(zero_copy_only=False)
        if len(w) and int(w.min()) <= 0:
            raise ValueError(
                f"grouped_weighted_median_int: non-positive weights in {weight!r}"
            )
        t = b.select([*keys, col, weight])
        g = pa.TableGroupBy(t, [*keys, col]).aggregate([(weight, "sum")])
        return g.rename_columns([*keys, col, "w_p"])

    hist = ds.map_batches(prag, batch_format="pyarrow").groupby([*keys, col]).sum("w_p")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col)
        w = g["sum(w_p)"].to_numpy(dtype=np.int64)
        cum = np.cumsum(w)
        tot = int(cum[-1])
        pos = int(np.searchsorted(2 * cum, tot, side="left"))
        return pd.DataFrame(
            [
                {
                    **{k: g[k].iloc[0] for k in keys},
                    "wmedian": int(g[col].to_numpy(dtype=np.int64)[pos]),
                }
            ]
        )

    out = hist.groupby(keys).map_groups(final, batch_format="pandas").to_pandas()
    return out.astype({"wmedian": "int64"})


def ordered_string_agg(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    order_cols: list[str],
    sep: str = "",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """SQL ``string_agg(val, sep ORDER BY order_cols)`` per key — the
    ordered-collect operator (DISTRIBUTED BY key, ORDERED WITHIN key).
    One complete-keys bucket shuffle; the in-bucket final sorts by
    (key, order_cols) and joins per group. Output is one row per key
    (key, agg, n) — per-key string size is the caller's density
    contract, exactly like SQL's. Order columns must make the order
    total (ties would make the result nondeterministic); callers pass
    a unique tiebreaker last."""
    from .window import _bucket_of, _resolve_buckets

    n_buckets = _resolve_buckets(n_buckets, floor=64)

    def tag(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        return b.select([key_col, val_col, *order_cols]).append_column(
            "_bucket", pa.array(_bucket_of(k, n_buckets))
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        gb = g.groupby(key_col, sort=False)[val_col]
        out = gb.agg(lambda s: sep.join(s.astype(str)))
        n = gb.size()
        return pd.DataFrame(
            {key_col: out.index, "agg": out.to_numpy(), "n": n.to_numpy(dtype=np.int64)}
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(agg, batch_format="pandas")
    )


def deterministic_split(
    ds: ray.data.Dataset,
    key_col: str,
    cuts: list[tuple[str, int, int]],
    last: str,
    hash_fn: str = "fnv1a",
) -> ray.data.Dataset:
    """Deterministic TRAIN/VAL/TEST-style dataset splitting: appends a
    ``split`` label chosen by where hash(key) falls among the
    CUMULATIVE integer thresholds ``cuts`` ((name, num, den): rows
    with h < num/den of the hash space and above every earlier cut),
    remainder labeled ``last``. Same hash machinery and guarantees as
    deterministic_sample — pure function of the key, identical at any
    parallelism/partitioning, and CONSISTENT with it: a
    deterministic_sample at rate r equals the union of the splits
    under r (samples and splits nest, so ablations stay aligned with
    the split a model trained on)."""
    fracs = [(name, (num << 32) // den) for name, num, den in cuts]
    for (na, ta), (nb, tb) in zip(fracs, fracs[1:]):
        if tb <= ta:
            raise ValueError(f"deterministic_split: cuts must be increasing ({na}>={nb})")

    if hash_fn == "md5":
        import hashlib

        def hashes(col) -> np.ndarray:
            return np.array(
                [int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) for k in col.to_pylist()],
                dtype=np.uint64,
            )

    else:

        def hashes(col) -> np.ndarray:
            import pyarrow.compute as pc

            from .text import fmix64, fnv1a_batch

            keys = pc.cast(col, pa.string())
            if col.null_count:
                keys = pc.fill_null(keys, "None")
            return fmix64(fnv1a_batch(keys)) >> np.uint64(32)

    def stage(b: pa.Table) -> pa.Table:
        h = hashes(b[key_col])
        label = np.full(len(h), last, dtype=object)
        assigned = np.zeros(len(h), dtype=bool)
        for name, t in fracs:
            sel = (~assigned) & (h < np.uint64(t))
            label[sel] = name
            assigned |= sel
        return b.append_column("split", pa.array(label, type=pa.string()))

    return ds.map_batches(stage, batch_format="pyarrow")


def percentile_cont_int(
    ds: ray.data.Dataset, col: str, fracs: list[tuple[int, int]]
) -> list[tuple[int, int, int]]:
    """SQL PERCENTILE_CONT as an EXACT RATIONAL over an integer
    column: for p = num/den the continuous percentile interpolates the
    order statistics at floor/ceil of (n-1)*p, and
    ``v_lo*(den - r) + v_hi*r`` over ``den`` (r = (n-1)*num mod den)
    is that value with no float until the caller's ONE division.
    Returns (numerator, denominator, n) per frac. Same distributed
    shape as exact_quantiles_int: groupby(value).count() + driver
    cumsum over the |distinct values| histogram — no global sort."""
    hist = ds.groupby(col).count().to_pandas()
    hist = hist[hist[col].notna()].sort_values(col)
    if hist.empty:
        raise ValueError(f"percentile_cont_int: no non-null values in {col!r}")
    counts = hist["count()"].to_numpy()
    values = hist[col].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1])

    def at(idx: int) -> int:
        return int(values[int(np.searchsorted(cum, idx + 1, side="left"))])

    out = []
    for num, den in fracs:
        k, r = divmod((n - 1) * num, den)
        lo = at(k)
        hi = at(k + 1) if r else lo
        out.append((lo * (den - r) + hi * r, den, n))
    return out


def weighted_sample_topk(
    ds: ray.data.Dataset,
    k: int,
    weight_col: str,
    key_col: str,
    hash_fn: str = "fnv1a",
) -> pd.DataFrame:
    """Deterministic WEIGHTED sampling without replacement
    (Efraimidis-Spirakis exponential race): row r wins iff its race
    key -ln(u_r)/w_r is among the k smallest, where u_r is a uniform
    derived from hash(key) — P(select) proportional to weight, yet the
    draw is a pure function of the keys (re-runs, repartitions and
    parallelism levels all agree). Shape: per-batch race keys + LOCAL
    top-k (lexsort by (race, key) so tie boundaries are exact), then
    one bounded driver final over <= #blocks x k candidate rows —
    never the corpus.

    ``hash_fn``: "fnv1a" (vectorized production path, np.log) or
    "md5" (per-row hashlib + math.log — scalar libm ln, bit-mirrorable
    in SQL as -ln((md5_u32+1)/2^32)/w; the oracle twin's path).
    Weights must be positive integers; u = (h32+1)/2^32 is in (0, 1]
    so ln never sees 0 (u == 1 gives race key 0.0, the best possible,
    deterministically).
    """
    if k <= 0:
        raise ValueError("weighted_sample_topk: k must be positive")

    def race_keys(b: pa.Table) -> np.ndarray:
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (w <= 0).any():
            raise ValueError("weighted_sample_topk: weights must be > 0")
        if hash_fn == "md5":
            import hashlib
            import math

            u = np.array(
                [
                    (int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) + 1)
                    / 4294967296.0
                    for x in b[key_col].to_pylist()
                ]
            )
            lnu = np.array([math.log(x) for x in u.tolist()])
        else:
            import pyarrow.compute as pc

            from .text import fmix64, fnv1a_batch

            keys = pc.cast(b[key_col], pa.string())
            h = (fmix64(fnv1a_batch(keys)) >> np.uint64(32)).astype(np.float64)
            lnu = np.log((h + 1.0) / 4294967296.0)
        return -lnu / w.astype(np.float64)

    def stage(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column("race_key", pa.array([], pa.float64()))
        r = race_keys(b)
        out = b.append_column("race_key", pa.array(r))
        if len(b) > k:
            kk = b[key_col].to_numpy(zero_copy_only=False)
            keep = np.lexsort((kk, r))[:k]
            out = out.take(pa.array(np.sort(keep)))
        return out

    cand = ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["race_key", key_col], kind="mergesort").head(k)
    return cand.reset_index(drop=True)


def island_length_histogram(
    ds: "ray.data.Dataset", col: str, range_size: int = 1024
) -> "pd.DataFrame":
    """Distributed GAPS-AND-ISLANDS: lengths of maximal runs of
    consecutive integers in ``col`` (values assumed distinct), as a
    (length -> n_chains) histogram.

    Scale shape: RANGE-bucket by value // range_size (contiguous
    ranges, one Dataset shuffle); each bucket resolves its interior
    runs locally and emits at most TWO boundary-touching segments, so
    the driver stitch walks O(#buckets) segments — never the value
    corpus. The SQL mirror is the classic id - row_number() island
    key; equality is pinned by the *_chain_lengths oracle."""
    import pandas as pd
    import pyarrow as pa

    rs = int(range_size)

    def add_rb(b: pa.Table) -> pa.Table:
        import numpy as np

        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({col: v, "_rb": np.floor_divide(v, rs)})

    def local_runs(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = np.sort(np.unique(g[col].to_numpy(dtype=np.int64)))
        rb = int(g["_rb"].iloc[0])
        lo, hi = rb * rs, rb * rs + rs - 1
        brk = np.nonzero(np.diff(v) > 1)[0]
        starts = np.r_[0, brk + 1]
        ends = np.r_[brk, len(v) - 1]
        first, last = v[starts], v[ends]
        edge = (first == lo) | (last == hi)
        lens = (last - first + 1)[~edge]
        ul, uc = np.unique(lens, return_counts=True)
        out = pd.DataFrame(
            {
                "kind": ["len"] * len(ul) + ["seg"] * int(edge.sum()),
                "a": np.concatenate([ul, first[edge]]),
                "b": np.concatenate([uc, last[edge]]),
            }
        )
        return out.astype({"kind": "object", "a": "int64", "b": "int64"})

    rows = (
        ds.map_batches(add_rb, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(local_runs, batch_format="pandas")
        .to_pandas()  # O(#buckets) rows by construction
    )
    hist: dict[int, int] = {}
    segs = []
    for _, r in rows.iterrows():
        if r["kind"] == "len":
            hist[int(r["a"])] = hist.get(int(r["a"]), 0) + int(r["b"])
        else:
            segs.append((int(r["a"]), int(r["b"])))
    segs.sort()
    k = 0
    while k < len(segs):
        first, last = segs[k]
        k2 = k + 1
        while k2 < len(segs) and segs[k2][0] == last + 1:
            last = segs[k2][1]
            k2 += 1
        ln = last - first + 1
        hist[ln] = hist.get(ln, 0) + 1
        k = k2
    out = pd.DataFrame(
        {"length": sorted(hist), "n_chains": [hist[x] for x in sorted(hist)]}
    ).astype({"length": "int64", "n_chains": "int64"})
    return out
