"""Dataset profiling — the data-quality "describe" sweep.

ONE pass over the table computes, for every requested column, the row
count, null count and EXACT distinct count. Each batch emits two row
kinds into one stream: per-column COUNT partials (routed by
hash(column), so a column's partials meet in one bucket) and
per-batch-DISTINCT (column, canonical-value) pairs (per-batch
np.unique first — the pre-aggregation that keeps the shuffle
O(distincts), not O(rows)); a single bucket groupby then both sums the
count partials and counts bucket-unique pairs. Canonical value strings
are injective per distinct value (ints and strings verbatim; floats
via shortest-roundtrip repr), so the distinct count equals SQL's
count(DISTINCT native) without shipping native types through the
shuffle. Output is |columns| rows; the input is read exactly once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .window import _bucket_of, _resolve_buckets


def profile_columns(
    ds: ray.data.Dataset,
    cols: list[str],
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """(column, n, n_null, n_distinct) per requested column — exact."""
    n_buckets = _resolve_buckets(n_buckets, floor=64)

    def stage(b: pa.Table) -> pa.Table:
        frames = []
        for c in cols:
            col = b[c]
            nn = col.null_count
            frames.append(
                pd.DataFrame(
                    {"column": [c], "sval": [None], "n_p": [len(b)], "null_p": [nn]}
                )
            )
            if nn:
                col = col.drop_null()
            v = col.to_numpy(zero_copy_only=False)
            u = np.unique(v)
            if np.issubdtype(u.dtype, np.floating):
                sval = np.array([repr(float(x)) for x in u], dtype=object)
            else:
                sval = u.astype(str)
            frames.append(
                pd.DataFrame(
                    {
                        "column": c,
                        "sval": sval,
                        "n_p": np.int64(0),
                        "null_p": np.int64(0),
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        key = pd.util.hash_array(
            (out["column"] + "\x1f" + out["sval"].fillna("\x00")).to_numpy(dtype=object),
            categorize=False,
        ).astype(np.int64)
        out["_bucket"] = _bucket_of(key, n_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_final(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g[g["sval"].isna()]
        pairs = g[g["sval"].notna()]
        parts = []
        if len(cnt):
            parts.append(
                cnt.groupby("column", as_index=False)
                .agg(n=("n_p", "sum"), n_null=("null_p", "sum"))
                .assign(d_p=np.int64(0))
            )
        if len(pairs):
            d = pairs[["column", "sval"]].drop_duplicates()
            vc = d["column"].value_counts()
            parts.append(
                pd.DataFrame(
                    {
                        "column": vc.index.to_numpy(),
                        "n": np.int64(0),
                        "n_null": np.int64(0),
                        "d_p": vc.to_numpy(dtype=np.int64),
                    }
                )
            )
        if not parts:
            return pd.DataFrame(
                {
                    "column": pd.Series(dtype=object),
                    "n": pd.Series(dtype="int64"),
                    "n_null": pd.Series(dtype="int64"),
                    "d_p": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(parts, ignore_index=True)

    parts = (
        ds.map_batches(stage, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_final, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("column", as_index=False).agg(
        n=("n", "sum"), n_null=("n_null", "sum"), n_distinct=("d_p", "sum")
    )
    out = out.astype({"n": "int64", "n_null": "int64", "n_distinct": "int64"})
    return out.sort_values("column").reset_index(drop=True)
