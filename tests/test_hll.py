"""HyperLogLog sketch: accuracy, exact clz, merge laws, serialization,
and the grouped aggregate vs exact distinct."""

import numpy as np
import pandas as pd
import ray.data

from rayhist.aggregate import grouped_approx_count_distinct
from rayhist.functions.hll import HLL, _clz64
from rayhist.ops.text import fmix64, fnv1a_batch


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )


def test_clz64_exact_vs_python():
    rng = np.random.default_rng(3)
    xs = np.concatenate(
        [
            rng.integers(0, 2**63, 500, dtype=np.int64).astype(np.uint64),
            # adversarial: just below/at powers of two (float log2 rounds wrong here)
            np.array(
                [0, 1, 2**63, 2**63 - 1, 2**53, 2**53 - 1, 2**53 + 1, 2**64 - 1],
                dtype=np.uint64,
            ),
        ]
    )
    got = _clz64(xs)
    exp = np.array([64 if v == 0 else 64 - int(v).bit_length() for v in xs])
    assert np.array_equal(got, exp)


def test_hll_accuracy_within_3_sigma():
    # p=14 -> rse ~ 1.04/sqrt(16384) ~ 0.81%
    for true_n in (1_000, 50_000, 500_000):
        h = fmix64(_hashes(true_n, seed=true_n))
        est = HLL.of(h).estimate()
        rel = abs(est - true_n) / true_n
        assert rel < 3 * 0.0082, (true_n, est, rel)


def test_hll_merge_equals_bulk_and_is_idempotent():
    h = fmix64(_hashes(40_000, seed=9))
    a, b = HLL.of(h[:25_000]), HLL.of(h[25_000:])
    merged = a.merge(b)
    bulk = HLL.of(h)
    assert np.array_equal(merged.reg, bulk.reg)
    # idempotent under retry: folding the same partial twice changes nothing
    again = merged.merge(a)
    assert np.array_equal(again.reg, merged.reg)
    # commutative
    assert np.array_equal(b.merge(a).reg, merged.reg)


def test_hll_duplicates_do_not_inflate():
    h = fmix64(_hashes(2_000, seed=4))
    once = HLL.of(h)
    tiled = HLL.of(np.tile(h, 50))
    assert np.array_equal(once.reg, tiled.reg)


def test_hll_serialization_roundtrip():
    s = HLL.of(fmix64(_hashes(10_000, seed=1)))
    s2 = HLL.from_bytes(s.to_bytes())
    assert s2.p == s.p and np.array_equal(s2.reg, s.reg)


def test_hll_small_range_linear_counting_is_near_exact():
    # 150 distinct values in 16384 registers: linear counting regime
    h = fmix64(_hashes(150, seed=7))
    assert HLL.of(h).count() == 150


def test_grouped_approx_count_distinct_vs_exact():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 30_000).astype(np.int64),
            "v": rng.integers(0, 4_000, 30_000).astype(np.int64),
        }
    )
    got = grouped_approx_count_distinct(
        ray.data.from_pandas(df).repartition(7), key="k", col="v"
    )
    exact = df.groupby("k")["v"].nunique()
    for _, row in got.iterrows():
        e = exact[row["k"]]
        assert abs(row["n_uniq_est"] - e) / e < 0.03, (row["k"], row["n_uniq_est"], e)


def test_hash_cast_matches_string_identity():
    """The aggregate hashes pc.cast(col, string): identical ints and
    their string forms must collide exactly (determinism contract)."""
    a = fmix64(fnv1a_batch(["17", "4242", "0"]))
    b = fmix64(fnv1a_batch(["17", "4242", "0"]))
    assert np.array_equal(a, b)
