"""Ordered / temporal join-and-window operators.

The reference engine is a batch engine with no join or window surface
(SURVEY.md §2.9/§2.11) — these are the target-only operators a
large-scale event/training-data pipeline needs on top of it:

- ``asof_join``: keyed as-of join (each left row matched to the
  latest right row at-or-before / earliest at-or-after its time) —
  the attribution join. Distributed as a co-partitioned hash bucket
  shuffle (complete by-keys per bucket), with the in-bucket match a
  vectorized sorted-merge (``pd.merge_asof``).
- ``interval_point_join``: non-equi range join of intervals against
  points (start <= t < end) with NO key equality. Distributed by
  time-binning: an interval is replicated to every bin it overlaps, a
  point goes to its own bin, so every qualifying pair meets in
  exactly one bucket (the point's) — no quadratic blow-up, no
  all-pairs shuffle; the replication factor is bounded by
  interval_length / bin_us + 1.
- ``with_prior_window`` / bucket-final rolling kernels: per-key
  ordered ROWS-frame window aggregates (sum/count over the previous
  W rows), vectorized with cumsum + key-boundary resets.

All buckets hold COMPLETE keys by construction, so per-key finals may
run inside the bucket stage (the ``sessions.py`` pattern) and only
|keys| small rows reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _resolve_buckets(n_buckets: int | None, floor: int = 256) -> int:
    """Cluster-scaled shuffle-bucket default (the hash_join rule): a
    CONSTANT caps the stage at that many tasks no matter how wide the
    cluster is, and lets per-bucket memory grow with the corpus."""
    if n_buckets is not None:
        return n_buckets
    import os

    import ray

    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
    else:
        ncpu = os.cpu_count() or 8
    return max(floor, ncpu * 4)


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id for an integer or object key array.
    Integer keys use plain modulo (balanced for id-like keys; raise
    n_buckets to salt); others hash through pandas' stable hasher."""
    if np.issubdtype(keys.dtype, np.integer):
        return (keys.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
    return (
        pd.util.hash_array(np.asarray(keys, dtype=object), categorize=False) % n_buckets
    ).astype(np.int64)


def _arrow_fields(schema) -> list[tuple[str, pa.DataType]]:
    """(name, Arrow type) pairs from a Ray Dataset schema. Parquet /
    Arrow-block sources already carry pa.DataType entries; a pandas-
    block source (``from_pandas`` with object columns) reports NUMPY
    dtypes, which ``pa.nulls`` rejects — normalize those (object maps
    to string, the pandas text convention)."""
    out = []
    for n, t in zip(schema.names, schema.types):
        if not isinstance(t, pa.DataType):
            t = pa.string() if t is object or str(t) == "object" else pa.from_numpy_dtype(t)
        out.append((n, t))
    return out


def _replicate_to_bins(
    s: np.ndarray, e: np.ndarray, bin_us: int
) -> tuple[np.ndarray, np.ndarray]:
    """Interval -> overlapped-bin replication used by BOTH range-join
    kernels (pair-expanding and coverage-counting): one (row index,
    bin id) pair per bin the half-open interval [s, e) overlaps. The
    two operators must agree bin-for-bin so a count query answered by
    either gives the same result — keep this the single copy.
    Malformed intervals (e < s) are rejected loudly: downstream they
    would crash np.repeat in the pair kernel but SILENTLY subtract
    from coverage counts."""
    if (e < s).any():
        bad = int((e < s).sum())
        raise ValueError(f"interval end < start on {bad} row(s)")
    b0 = s // bin_us
    b1 = np.maximum(e - 1, s) // bin_us  # end exclusive; empty -> own bin
    reps = (b1 - b0 + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(s)), reps)
    # bin id per replica: running offset within each row's span
    off = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
    return idx, b0[idx] + off


def _empty_frame(fields: list[tuple[str, pa.DataType]]) -> pd.DataFrame:
    """Zero-row frame whose dtypes mirror what a NON-empty bucket
    emits for the same fields (ints int64, other types via the Arrow
    default), so an empty bucket's block never carries a conflicting
    Arrow schema (an all-int64 placeholder against a string column
    fails Ray's block-schema unification)."""
    df = pa.table({n: pa.nulls(0, t) for n, t in fields}).to_pandas()
    for n, t in fields:
        if pa.types.is_integer(t):
            df[n] = df[n].astype("int64")
    return df


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: str,
    direction: str = "backward",
    n_buckets: int | None = None,
    rsuffix: str = "_r",
    group_final=None,
) -> ray.data.Dataset:
    """Keyed as-of join: for each left row, the single right row with
    the same ``by`` key and the latest ``on`` <= left.on (backward,
    inclusive — the SQL ``ASOF JOIN ... ON l.by = r.by AND l.on >=
    r.on`` contract) or earliest >= (forward). Unmatched left rows
    keep nulls (LEFT semantics).

    Both sides are bucketed by hash(by) and co-grouped — ONE shuffle
    per side, complete keys per bucket — and the in-bucket match is a
    sorted vectorized merge. Right columns colliding with left names
    (including ``on``) come back suffixed with ``rsuffix``.

    ``group_final``: optional pandas->pandas callable applied to each
    bucket's joined frame BEFORE it leaves the stage. Because a bucket
    holds complete ``by`` keys, any per-key aggregate is final there —
    use it so only |keys| small rows stream out instead of |left|.
    """
    n_buckets = _resolve_buckets(n_buckets)
    lschema, rschema = left.schema(), right.schema()
    if on not in rschema.names:
        raise ValueError(f"asof_join: right side lacks the on-column {on!r}")
    if on not in lschema.names:
        raise ValueError(f"asof_join: left side lacks the on-column {on!r}")
    if on == by:
        raise ValueError("asof_join: on and by must be distinct columns")
    lcols = list(lschema.names)
    # right columns after rename (by keeps its name: it is the equi key)
    ren = {c: (c if (c == by or c not in lcols) else c + rsuffix) for c in rschema.names}
    rcols_out = [ren[c] for c in rschema.names if c != by]
    clash = set(rcols_out) & set(lcols)
    if clash:  # a suffixed right name colliding with a left column
        raise ValueError(f"rsuffix={rsuffix!r} collides with left columns: {sorted(clash)}")
    if len(set(rcols_out)) != len(rcols_out):  # e.g. right has both v and v_r
        dup = sorted({c for c in rcols_out if rcols_out.count(c) > 1})
        raise ValueError(f"rsuffix={rsuffix!r} makes right columns collide: {dup}")

    lfields = dict(_arrow_fields(lschema))
    rfields = dict(_arrow_fields(rschema))
    all_fields = [(n, lfields[n]) for n in lcols] + [
        (ren[c], rfields[c]) for c in rschema.names if c != by
    ]

    def tag(side: int, rename: dict | None):
        def fn(batch: pa.Table) -> pa.Table:
            if rename:
                batch = batch.rename_columns([rename[c] for c in batch.schema.names])
            n = len(batch)
            own = set(batch.schema.names)
            cols = {}
            for name, typ in all_fields:
                cols[name] = batch[name] if name in own else pa.nulls(n, typ)
            keys = batch[by].to_numpy(zero_copy_only=False)
            cols["_bucket"] = pa.array(_bucket_of(keys, n_buckets))
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    both = left.map_batches(tag(1, None), batch_format="pyarrow").union(
        right.map_batches(tag(0, ren), batch_format="pyarrow")
    )

    int_cols = [n for n, t in all_fields if pa.types.is_integer(t)]
    ron = ren.get(on, on)

    def join_bucket(t: pa.Table) -> pd.DataFrame:
        # nullable Int64 mapping: union-padding nulls must not coerce
        # int64 columns to float64 (money rule — see hash_join)
        g = t.to_pandas(
            types_mapper=lambda typ: pd.Int64Dtype() if pa.types.is_integer(typ) else None
        )
        # explicit copies: the astype writes below must never hit a
        # pandas view-vs-copy landmine
        lg = g.loc[g["_side"] == 1, lcols].copy()
        rg = g.loc[g["_side"] == 0, [by, *rcols_out]].copy()
        # downcast ONLY the merge keys to numpy int64 (merge_asof
        # rejects masked on-keys); VALUE columns stay nullable Int64 so
        # an unmatched left row pads pd.NA instead of coercing the
        # whole column to float64 (money rule — exactness above 2^53)
        for frame in (lg, rg):
            for c in frame.columns:
                if c in (on, ron, by) and c in int_cols and frame[c].notna().all():
                    frame[c] = frame[c].astype("int64")
        lg = lg.sort_values(on, kind="mergesort")
        # ron != on always: right carries `on` (validated above) and
        # `on` is a left column, so the rename suffixed it
        rg = rg.sort_values(ron, kind="mergesort")
        out = pd.merge_asof(
            lg, rg, left_on=on, right_on=ron, by=by, direction=direction
        )
        # the right on-key went through merge_asof as numpy int64, so
        # unmatched-row NaN padding upcast it to float64 — restore the
        # nullable-int dtype (int64 microseconds fit float64 exactly,
        # so the round-trip is lossless for the time contract)
        if ron in out.columns and ron in int_cols:
            out[ron] = out[ron].astype("Int64")
        return group_final(out) if group_final is not None else out

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def interval_point_join(
    intervals: ray.data.Dataset,
    points: ray.data.Dataset,
    start_col: str,
    end_col: str,
    t_col: str,
    bin_us: int,
    n_buckets: int | None = None,
    group_final=None,
) -> ray.data.Dataset:
    """Non-equi range join: all (interval, point) pairs with
    ``start <= t < end`` (half-open, the engine's interval contract).
    Time columns are int64 microseconds.

    Distribution: time is cut into ``bin_us`` bins; an interval row is
    REPLICATED into every bin it overlaps (replication factor bounded
    by len/bin_us + 1 — pick bin_us ~ the typical interval length), a
    point goes only to bin(t), and bins are hash-folded onto
    ``n_buckets`` shuffle buckets. Each qualifying pair meets in
    exactly one bin (the point's), so no dedup pass is needed. The
    in-bucket match is a per-bin sorted ``searchsorted`` range scan —
    no quadratic work beyond the true output size.

    Returns the pair Dataset (interval columns + point columns).
    ``group_final`` (pandas->pandas, applied per bucket) turns it into
    a partial-aggregate stream instead — at corpus scale ALWAYS prefer
    a partial aggregate over materializing O(pairs) rows.
    """
    n_buckets = _resolve_buckets(n_buckets)
    ischema, pschema = intervals.schema(), points.schema()
    icols = list(ischema.names)
    shared = set(ischema.names) & set(pschema.names)
    if shared:
        # a shared name would silently take the interval slot while
        # being filled from the points batch — ambiguous; rename upstream
        raise ValueError(f"interval/point column names must be disjoint: {sorted(shared)}")
    pcols = [c for c in pschema.names if c not in icols]
    iset, pset = frozenset(icols), frozenset(pcols)
    all_fields = [*((n, t) for n, t in _arrow_fields(ischema)), *(
        (n, t) for n, t in _arrow_fields(pschema) if n in pset
    )]

    def tag_intervals(batch: pa.Table) -> pa.Table:
        s = batch[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx, bins = _replicate_to_bins(s, e, bin_us)
        cols = {}
        for name, typ in all_fields:
            cols[name] = batch[name].take(pa.array(idx)) if name in iset else pa.nulls(len(idx), typ)
        cols["_bin"] = pa.array(bins)
        cols["_bucket"] = pa.array((bins % n_buckets).astype(np.int64))
        cols["_side"] = pa.array(np.full(len(idx), 1, dtype=np.int8))
        return pa.table(cols)

    def tag_points(batch: pa.Table) -> pa.Table:
        n = len(batch)
        t = batch[t_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bins = t // bin_us
        cols = {}
        for name, typ in all_fields:
            cols[name] = batch[name] if name in pset else pa.nulls(n, typ)
        cols["_bin"] = pa.array(bins)
        cols["_bucket"] = pa.array((bins % n_buckets).astype(np.int64))
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    both = intervals.map_batches(tag_intervals, batch_format="pyarrow").union(
        points.map_batches(tag_points, batch_format="pyarrow")
    )

    int_cols = [n for n, t in all_fields if pa.types.is_integer(t)]

    def join_bucket(t: pa.Table) -> pd.DataFrame:
        g = t.to_pandas(
            types_mapper=lambda typ: pd.Int64Dtype() if pa.types.is_integer(typ) else None
        )
        outs = []
        for _bin, gb in g.groupby("_bin", sort=False):
            iv = gb[gb["_side"] == 1]
            pt = gb[gb["_side"] == 0]
            if iv.empty or pt.empty:
                continue
            pt = pt.sort_values(t_col, kind="mergesort")
            tvals = pt[t_col].to_numpy(dtype=np.int64)
            s = iv[start_col].to_numpy(dtype=np.int64)
            e = iv[end_col].to_numpy(dtype=np.int64)
            lo = np.searchsorted(tvals, s, side="left")
            hi = np.searchsorted(tvals, e, side="left")
            cnt = hi - lo
            if cnt.sum() == 0:
                continue
            irep = np.repeat(np.arange(len(iv)), cnt)
            # concatenated ranges lo[i]..hi[i] without a Python loop
            prep = np.arange(len(irep)) - np.repeat(np.cumsum(cnt) - cnt, cnt) + lo[irep]
            pairs = pd.concat(
                [
                    iv.iloc[irep][icols].reset_index(drop=True),
                    pt.iloc[prep][pcols].reset_index(drop=True),
                ],
                axis=1,
            )
            outs.append(pairs)
        if not outs:
            out = _empty_frame(all_fields)
        else:
            out = pd.concat(outs, ignore_index=True)
        for c in int_cols:
            if c in out.columns and out[c].notna().all():
                out[c] = out[c].astype("int64")
        return group_final(out) if group_final is not None else out

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pyarrow")


def prior_window_sums(
    sorted_keys: np.ndarray, values: np.ndarray, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """ROWS-frame window kernel: for rows already sorted by (key,
    order), return (prior_sum, prior_n) over the frame ``ROWS BETWEEN
    window PRECEDING AND 1 PRECEDING`` restarting at key boundaries.
    Vectorized: cumulative sums with per-key start offsets; integer
    values stay integer (exact — money rule)."""
    n = len(values)
    if n == 0:
        return values[:0], np.zeros(0, dtype=np.int64)
    new_key = np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
    key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
    pos = np.arange(n) - key_start  # 0-based position within key
    cum = np.concatenate([[0], np.cumsum(values)])  # cum[i] = sum(values[:i])
    frame_lo = np.maximum(np.arange(n) - window, key_start)
    prior_sum = cum[np.arange(n)] - cum[frame_lo]
    prior_n = np.minimum(pos, window).astype(np.int64)
    return prior_sum, prior_n


def with_prior_window(
    ds: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    n_buckets: int | None = None,
    group_final=None,
) -> ray.data.Dataset:
    """Per-key ordered window aggregate: appends ``prior_sum`` /
    ``prior_n`` = sum/count of ``value_col`` over the previous
    ``window`` rows of the same key (rows ordered by ``order_cols``;
    the frame excludes the current row). Keys are hash-bucketed
    complete, so ``group_final`` may compute per-key finals in-stage
    (emit |keys| rows, not |rows|)."""
    n_buckets = _resolve_buckets(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column("_bucket", pa.array(_bucket_of(k, n_buckets)))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"]).sort_values(
            [key_col, *order_cols], kind="mergesort"
        )
        ps, pn = prior_window_sums(
            g[key_col].to_numpy(), g[value_col].to_numpy(), window
        )
        g = g.assign(prior_sum=ps, prior_n=pn)
        return group_final(g) if group_final is not None else g

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_fn, batch_format="pandas")
    )


def with_ranked_window(
    ds: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n_buckets: int | None = None,
    group_final=None,
    ntile: int | None = None,
    extras: frozenset | set | tuple = (),
) -> ray.data.Dataset:
    """Per-key ordered RANKED-WINDOW stage: the classic SQL window
    functions the frame-aggregate ops don't cover. Appends, per key
    (rows ordered by ``order_cols``):

    - ``row_number``: 1-based position within the key (ROW_NUMBER()),
    - ``dense_rank``: DENSE_RANK() of ``value_col`` within the key
      (ordered by value; ties share a rank, no gaps),
    - ``prior_val``: LAG(value, 1) — the previous row's value, null
      on each key's first row,
    - ``prior_max``: MAX(value) OVER (ROWS BETWEEN UNBOUNDED
      PRECEDING AND 1 PRECEDING) — the running max of strictly-prior
      values, null on each key's first row,
    - ``tile`` (only when ``ntile`` is given): NTILE(ntile) over the
      key's order — equal-frequency buckets with the SQL remainder
      rule (the first n mod k tiles get one extra row).

    ``extras`` opts into the remaining SQL window functions (kept off
    the default path so existing callers' schemas are untouched):

    - ``'lead'`` -> ``next_val``: LEAD(value, 1) in the key's order,
      null on each key's last row (nullable Int64 — exact cents),
    - ``'first'`` -> ``first_val``: FIRST_VALUE(value) in the key's
      order (the ROWS UNBOUNDED PRECEDING frame's first row),
    - ``'dist'`` -> ``pct_rank`` / ``cume_dist``: PERCENT_RANK() and
      CUME_DIST() OVER (PARTITION BY key ORDER BY value) — each a
      SINGLE IEEE float64 division of exact int64 ranks/counts
      ((rank-1)/(n-1) with the SQL n==1 -> 0.0 rule, and rank_max/n),
      so the values are bit-identical to any engine computing the
      same two-integer division (the money-rule float exemption).

    Keys are hash-bucketed complete (the ``with_prior_window``
    contract), so ``group_final`` may compute per-key finals in-stage
    and emit |keys| rows. The lag/max columns are pandas nullable
    Int64 — exact at any int64 magnitude (money rule: a shift that
    coerces cents to float64 silently loses exactness above 2^53).
    ``value_col`` must be integer and non-null; null keys or values
    raise loudly (a groupby would silently drop null-key rows)."""
    if ntile is not None and ntile < 1:
        raise ValueError(f"with_ranked_window: ntile must be >= 1, got {ntile}")
    extras = frozenset(extras)
    if not extras <= {"lead", "first", "dist"}:
        raise ValueError(
            f"with_ranked_window: unknown extras {sorted(extras - {'lead', 'first', 'dist'})}"
        )
    n_buckets = _resolve_buckets(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch[key_col].null_count or batch[value_col].null_count:
            raise ValueError(
                f"with_ranked_window: null {key_col!r}/{value_col!r} rows "
                "(pandas groupby would drop them silently); filter upstream"
            )
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column("_bucket", pa.array(_bucket_of(k, n_buckets)))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"]).sort_values(
            [key_col, *order_cols], kind="mergesort"
        )
        # positional frame: groupby kernels (cumcount/shift/cummax/rank)
        # are Cython-vectorized; Int64 keeps lag/max exact under nulls
        t = pd.DataFrame(
            {
                "k": g[key_col].to_numpy(),
                "v": pd.array(g[value_col].to_numpy(), dtype="Int64"),
            }
        )
        gb = t.groupby("k", sort=False)["v"]
        prior_val = gb.shift(1)
        prior_max = (
            pd.DataFrame({"k": t["k"], "c": gb.cummax()})
            .groupby("k", sort=False)["c"]
            .shift(1)
        )
        pos = t.groupby("k", sort=False).cumcount().to_numpy()
        g = g.assign(
            row_number=pos + 1,
            dense_rank=gb.rank(method="dense").to_numpy().astype(np.int64),
            prior_val=prior_val.array,
            prior_max=prior_max.array,
        )
        if "lead" in extras:
            g = g.assign(next_val=gb.shift(-1).array)
        if "first" in extras:
            g = g.assign(first_val=gb.transform("first").to_numpy().astype(np.int64))
        if "dist" in extras:
            n = t.groupby("k", sort=False)["v"].transform("size").to_numpy()
            n = n.astype(np.int64)
            r_min = gb.rank(method="min").to_numpy().astype(np.int64)
            r_max = gb.rank(method="max").to_numpy().astype(np.int64)
            # one float64 division of exact int64s each (money rule);
            # SQL defines PERCENT_RANK() = 0 for single-row partitions
            g = g.assign(
                pct_rank=np.where(n > 1, (r_min - 1) / np.maximum(n - 1, 1), 0.0),
                cume_dist=r_max / n,
            )
        if ntile is not None:
            # SQL NTILE remainder rule: n = key size, big = n // k,
            # r = n % k; the first r tiles hold big+1 rows. big == 0
            # (n < k) degenerates to tile = pos + 1 via the first
            # branch (r == n, every pos < r * 1).
            n = gb.transform("size").to_numpy().astype(np.int64)
            big, r = n // ntile, n % ntile
            head = r * (big + 1)
            tile = np.where(
                pos < head,
                pos // (big + 1),
                r + (pos - head) // np.maximum(big, 1),
            )
            g = g.assign(tile=(tile + 1).astype(np.int64))
        return group_final(g) if group_final is not None else g

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_fn, batch_format="pandas")
    )


def distinct_set_op(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    on: str,
    mode: str,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Distributed DISTINCT set operation on one key column:
    ``except`` (keys of a not in b), ``intersect``, or ``union``.
    Each batch is pre-deduped before the shuffle (only unique keys per
    batch move), keys are hash-bucketed, and the set op runs
    vectorized per bucket — the SQL EXCEPT/INTERSECT/UNION the
    reference never exposed (SURVEY.md §2.9)."""
    if mode not in ("except", "intersect", "union"):
        raise ValueError(f"unknown set op {mode!r}")
    n_buckets = _resolve_buckets(n_buckets)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            # null keys have no SQL DISTINCT set semantics here and
            # would crash np.unique's sort (None vs str) or silently
            # ride NaN float semantics — reject loudly
            if batch[on].null_count:
                raise ValueError(
                    f"distinct_set_op: null keys in {on!r} "
                    f"({batch[on].null_count} in one batch); filter them upstream"
                )
            k = np.unique(batch[on].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    on: pa.array(k),
                    "_bucket": pa.array(_bucket_of(k, n_buckets)),
                    "_side": pa.array(np.full(len(k), side, dtype=np.int8)),
                }
            )

        return fn

    both = a.map_batches(tag(1), batch_format="pyarrow").union(
        b.map_batches(tag(0), batch_format="pyarrow")
    )

    def op_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ka = np.unique(g.loc[g["_side"] == 1, on].to_numpy())
        kb = np.unique(g.loc[g["_side"] == 0, on].to_numpy())
        if mode == "except":
            out = np.setdiff1d(ka, kb, assume_unique=True)
        elif mode == "intersect":
            out = np.intersect1d(ka, kb, assume_unique=True)
        else:
            out = np.union1d(ka, kb)
        return pd.DataFrame({on: out})

    return both.groupby("_bucket").map_groups(op_bucket, batch_format="pandas")


def prior_time_window_agg(
    sorted_keys: np.ndarray,
    sorted_t: np.ndarray,
    values: np.ndarray,
    dt: int,
) -> tuple[np.ndarray, np.ndarray]:
    """RANGE-frame window kernel: for rows sorted by (key, t), return
    (window_sum, window_n) of ``values`` over the frame
    ``[t_i - dt, t_i)`` within the same key — the strictly-before time
    window (SQL ``RANGE BETWEEN dt PRECEDING AND 1 PRECEDING`` on
    integer time: equal-t peers are EXCLUDED on both sides).

    Fully vectorized: per-key times are embedded on a shared monotone
    axis (key ordinal x stride + relative t), so ONE ``searchsorted``
    pair resolves every row's window bounds; an explicit overflow
    assert guards the embedding."""
    n = len(sorted_t)
    if n == 0:
        return np.zeros(0, dtype=values.dtype), np.zeros(0, dtype=np.int64)
    new_key = np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
    ordinal = np.cumsum(new_key) - 1  # 0-based key index
    t_rel = sorted_t.astype(np.int64) - int(sorted_t.min())
    stride = int(t_rel.max()) + int(dt) + 2  # keys never overlap on the axis
    # guard computed in PYTHON ints: the np.int64 product could itself
    # wrap negative and sail past the very check it implements
    if int(ordinal[-1] + 1) * stride >= np.iinfo(np.int64).max // 2:
        raise OverflowError(
            "time-window embedding overflow: too many keys x time span; "
            "raise n_buckets so each bucket holds fewer keys"
        )
    u = ordinal * stride + t_rel
    lo = np.searchsorted(u, ordinal * stride + (t_rel - dt), side="left")
    hi = np.searchsorted(u, u, side="left")  # first index of the t-tie run
    cum = np.concatenate([[0], np.cumsum(values)])
    return cum[hi] - cum[lo], (hi - lo).astype(np.int64)


def with_time_window(
    ds: ray.data.Dataset,
    key_col: str,
    t_col: str,
    value_col: str,
    dt: int,
    n_buckets: int | None = None,
    group_final=None,
) -> ray.data.Dataset:
    """Per-key time-based sliding window: appends ``win_sum`` /
    ``win_n`` = sum/count of ``value_col`` over the same key's rows in
    the strictly-before interval ``[t - dt, t)``. Same bucketed
    complete-keys distribution as ``with_prior_window`` (ROWS frame);
    this is the RANGE frame."""
    n_buckets = _resolve_buckets(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column("_bucket", pa.array(_bucket_of(k, n_buckets)))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"]).sort_values(
            [key_col, t_col], kind="mergesort"
        )
        ws, wn = prior_time_window_agg(
            g[key_col].to_numpy(),
            g[t_col].to_numpy(),
            g[value_col].to_numpy(),
            dt,
        )
        g = g.assign(win_sum=ws, win_n=wn)
        return group_final(g) if group_final is not None else g

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_fn, batch_format="pandas")
    )


def interval_coverage_counts(
    intervals: ray.data.Dataset,
    points: ray.data.Dataset,
    start_col: str,
    end_col: str,
    t_col: str,
    bin_us: int,
    n_buckets: int | None = None,
    group_final=None,
) -> ray.data.Dataset:
    """COUNT-style range join without pair expansion: each point row
    comes back with ``n_cover`` = number of intervals containing it
    (start <= t < end). Same time-binned replication distribution as
    ``interval_point_join``, but the in-bucket kernel is coverage
    counting — ``(#starts <= t) - (#ends <= t)`` over two sorted
    arrays — so the work is O((n_i + n_p) log) per bin and NOTHING of
    pair cardinality is ever materialized. Use THIS whenever the
    consumer aggregates pair counts: the pair join's output is
    inherently quadratic (measured: 10M events -> 2.8e9 pairs, 117 s;
    coverage counting answers the same daily-count query in ~3 s).
    ``group_final`` (pandas->pandas per bucket) for in-stage partials."""
    n_buckets = _resolve_buckets(n_buckets)
    ischema, pschema = intervals.schema(), points.schema()
    shared = set(ischema.names) & set(pschema.names)
    if shared:
        raise ValueError(f"interval/point column names must be disjoint: {sorted(shared)}")
    pcols = list(pschema.names)
    pfields = _arrow_fields(pschema)

    def tag_intervals(batch: pa.Table) -> pa.Table:
        s = batch[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx, bins = _replicate_to_bins(s, e, bin_us)
        cols = {"_s": pa.array(s[idx]), "_e": pa.array(e[idx])}
        for c, typ in pfields:
            cols[c] = pa.nulls(len(idx), typ)
        cols["_bin"] = pa.array(bins)
        cols["_bucket"] = pa.array((bins % n_buckets).astype(np.int64))
        cols["_side"] = pa.array(np.full(len(idx), 1, dtype=np.int8))
        return pa.table(cols)

    def tag_points(batch: pa.Table) -> pa.Table:
        n = len(batch)
        t = batch[t_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bins = t // bin_us
        cols = {"_s": pa.nulls(n, pa.int64()), "_e": pa.nulls(n, pa.int64())}
        for c in pcols:
            cols[c] = batch[c]
        cols["_bin"] = pa.array(bins)
        cols["_bucket"] = pa.array((bins % n_buckets).astype(np.int64))
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    both = intervals.map_batches(tag_intervals, batch_format="pyarrow").union(
        points.map_batches(tag_points, batch_format="pyarrow")
    )

    def count_bucket(tbl: pa.Table) -> pd.DataFrame:
        g = tbl.to_pandas(
            types_mapper=lambda typ: pd.Int64Dtype() if pa.types.is_integer(typ) else None
        )
        outs = []
        for _bin, gb in g.groupby("_bin", sort=False):
            pt = gb[gb["_side"] == 0]
            if pt.empty:
                continue
            iv = gb[gb["_side"] == 1]
            t = pt[t_col].to_numpy(dtype=np.int64)
            if iv.empty:
                n_cover = np.zeros(len(pt), dtype=np.int64)
            else:
                starts = np.sort(iv["_s"].to_numpy(dtype=np.int64))
                ends = np.sort(iv["_e"].to_numpy(dtype=np.int64))
                n_cover = (
                    np.searchsorted(starts, t, side="right")
                    - np.searchsorted(ends, t, side="right")
                ).astype(np.int64)
            out = pt[pcols].reset_index(drop=True).assign(n_cover=n_cover)
            outs.append(out)
        if not outs:
            res = _empty_frame([*pfields, ("n_cover", pa.int64())])
        else:
            res = pd.concat(outs, ignore_index=True)
            for c in pcols:
                if res[c].notna().all() and str(res[c].dtype).startswith("Int"):
                    res[c] = res[c].astype("int64")
        return group_final(res) if group_final is not None else res

    return both.groupby("_bucket").map_groups(count_bucket, batch_format="pyarrow")


def per_key_interarrival(
    ds: ray.data.Dataset,
    key_col: str,
    t_col: str,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-key LAG analytics: inter-arrival gaps (t - lag(t) within
    the key, time-ordered) reduced to per-key gap count and EXACT
    discrete median gap (value at sorted index (n-1)//2 — the
    engine's quantile rule). Complete keys per bucket, so the median
    is final in-stage; only |keys| rows leave. Keys with fewer than
    two rows emit no gap row (lag of the first row is NULL in SQL)."""
    n_buckets = _resolve_buckets(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column("_bucket", pa.array(_bucket_of(k, n_buckets)))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"]).sort_values(
            [key_col, t_col], kind="mergesort"
        )
        k = g[key_col].to_numpy()
        t = g[t_col].to_numpy().astype(np.int64)
        same = np.r_[False, k[1:] == k[:-1]]  # gap rows: same key as prev
        gaps = np.r_[0, t[1:] - t[:-1]][same]
        gkeys = k[same]
        if len(gaps) == 0:
            return pd.DataFrame(
                {key_col: pd.Series(dtype=g[key_col].dtype),
                 "n_gaps": pd.Series(dtype="int64"),
                 "med_gap_us": pd.Series(dtype="int64")}
            )
        # per-key exact discrete median: sort (key, gap), pick the
        # (n-1)//2-th gap of each key run — fully vectorized
        order = np.lexsort((gaps, gkeys))
        sk, sg = gkeys[order], gaps[order]
        new = np.r_[True, sk[1:] != sk[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(sk)])
        med_idx = starts + (counts - 1) // 2
        return pd.DataFrame(
            {key_col: sk[starts], "n_gaps": counts.astype(np.int64),
             "med_gap_us": sg[med_idx].astype(np.int64)}
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_fn, batch_format="pandas")
    )
