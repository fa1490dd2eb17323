"""Misra-Gries heavy-hitters summary — mergeable frequent-items sketch.

The scale path for frequency/top-k questions the engine otherwise
answers exactly (``keytable_freqs``-style groupby + sort): a
Misra-Gries summary of capacity k keeps at most k (value, count)
counters per partial with the classic guarantee

    true_count - n/(k+1)  <=  est_count  <=  true_count

(n = total stream weight folded in), so every item with frequency
above n/(k+1) is guaranteed PRESENT, and when the true distinct count
is <= k the summary is EXACT (zero error) — the regime the
oracle-checked query runs in, exactly like the full-probe-LSH "exact
operating point" pattern. Merging follows Agarwal et al. (2012):
add counters pairwise, and if more than k survive, subtract the
(k+1)-th largest count from all and drop the non-positive — the merge
is associative in its error bound, so partial summaries combine in
any tree shape. Unlike HLL registers the merge is NOT idempotent
(re-folding the same partial doubles its counts); that is safe here
because partials are consumed from the finished Dataset output —
a retried task REPLACES its block, it never appears twice.

Per-batch construction is vectorized: values are pre-aggregated with
``np.unique`` so the Python-dict work is O(distinct-in-batch), not
O(rows).
"""

from __future__ import annotations

import numpy as np


class MisraGries:
    __slots__ = ("k", "counters")

    def __init__(self, k: int):
        if k < 1:
            raise ValueError("capacity must be >= 1")
        self.k = k
        self.counters: dict[object, int] = {}

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        counts = np.sort(np.fromiter(self.counters.values(), dtype=np.int64))
        cut = int(counts[-(self.k + 1)])  # (k+1)-th largest
        self.counters = {
            v: c - cut for v, c in self.counters.items() if c - cut > 0
        }

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> "MisraGries":
        vals, inv = np.unique(np.asarray(values), return_inverse=True)
        if weights is None:
            cnts = np.bincount(inv, minlength=len(vals)).astype(np.int64)
        else:
            cnts = np.bincount(inv, weights=np.asarray(weights, dtype=np.float64)).astype(np.int64)
        return self.add_weighted_items(vals.tolist(), cnts.tolist())

    def add_weighted_items(self, values: list, counts) -> "MisraGries":
        """Fold pre-aggregated (value, count) pairs (e.g. from an
        Arrow ``value_counts`` kernel) — values need not be unique."""
        for v, c in zip(values, counts):
            self.counters[v] = self.counters.get(v, 0) + int(c)
        self._shrink()
        return self

    @classmethod
    def of(cls, values: np.ndarray, k: int) -> "MisraGries":
        return cls(k).add(values)

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError(f"capacity mismatch: {self.k} vs {other.k}")
        out = MisraGries(self.k)
        out.counters = dict(self.counters)
        for v, c in other.counters.items():
            out.counters[v] = out.counters.get(v, 0) + c
        out._shrink()
        return out

    def top(self, n: int) -> list[tuple[object, int]]:
        """Top-n by estimated count, ties broken by value ascending
        (deterministic across merge orders in the exact regime)."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))[:n]

    def to_items(self) -> tuple[list, list[int]]:
        vs = sorted(self.counters)
        return vs, [self.counters[v] for v in vs]

    @classmethod
    def from_items(cls, k: int, values: list, counts: list[int]) -> "MisraGries":
        mg = cls(k)
        # SUM duplicated values (dict(zip) would keep only the last
        # count, silently breaking the est <= true lower bound) — same
        # contract as add_weighted_items ('values need not be unique')
        for v, c in zip(values, counts):
            mg.counters[v] = mg.counters.get(v, 0) + int(c)
        mg._shrink()
        return mg
