"""Misra-Gries heavy hitters: exactness under capacity, the classic
error/presence guarantees above it, merge == bulk bounds, and the
grouped aggregate in both regimes."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from rayhist.aggregate import approx_heavy_hitters
from rayhist.functions.heavyhitters import MisraGries


def _zipf_stream(n=50_000, n_vals=400, seed=5):
    rng = np.random.default_rng(seed)
    vals = rng.zipf(1.3, n) % n_vals
    return np.array([f"v{int(v)}" for v in vals], dtype=object)


def test_exact_when_distinct_below_capacity():
    s = _zipf_stream(10_000, n_vals=30)
    mg = MisraGries.of(s, k=64)
    exact = pd.Series(s).value_counts()
    assert len(mg.counters) == exact.size
    for v, c in mg.counters.items():
        assert c == exact[v]


def test_error_and_presence_guarantees_when_lossy():
    s = _zipf_stream(80_000, n_vals=2_000)
    k = 50
    mg = MisraGries.of(s, k=k)
    exact = pd.Series(s).value_counts()
    bound = len(s) / (k + 1)
    # every stored count within [true - n/(k+1), true]
    for v, c in mg.counters.items():
        assert c <= exact[v]
        assert c >= exact[v] - bound
    # every item above the bound is present
    for v, c in exact.items():
        if c > bound:
            assert v in mg.counters, (v, c, bound)


def test_merge_respects_combined_bound():
    s = _zipf_stream(60_000, n_vals=1_500, seed=9)
    k = 40
    a = MisraGries.of(s[:30_000], k)
    b = MisraGries.of(s[30_000:], k)
    merged = a.merge(b)
    assert len(merged.counters) <= k
    exact = pd.Series(s).value_counts()
    bound = len(s) / (k + 1) * 2  # merge may double the per-half bound
    for v, c in merged.counters.items():
        assert c <= exact[v]
        assert c >= exact[v] - bound


def test_serialization_roundtrip_and_capacity_mismatch():
    mg = MisraGries.of(_zipf_stream(5_000, 100), 64)
    vs, cs = mg.to_items()
    mg2 = MisraGries.from_items(64, vs, cs)
    assert mg2.counters == mg.counters
    with pytest.raises(ValueError):
        mg.merge(MisraGries(32))


def test_approx_heavy_hitters_exact_regime_matches_groupby():
    s = _zipf_stream(20_000, n_vals=25, seed=3)
    ds = ray.data.from_pandas(pd.DataFrame({"c": s})).repartition(6)
    got = approx_heavy_hitters(ds, "c", k=64, top_n=10)
    exact = (
        pd.Series(s)
        .value_counts()
        .rename_axis("c")
        .reset_index(name="n")
        .sort_values(["n", "c"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    assert got["c"].tolist() == exact["c"].tolist()
    assert got["n"].tolist() == exact["n"].tolist()
    assert got["rank"].tolist() == list(range(1, 11))


def test_from_items_sums_duplicates():
    """Transported partials with repeated values must SUM, not keep
    the last count (the est <= true lower-bound guarantee)."""
    from rayhist.functions.heavyhitters import MisraGries

    mg = MisraGries.from_items(4, ["a", "a", "b"], [5, 7, 2])
    assert mg.counters["a"] == 12 and mg.counters["b"] == 2
