"""A from-scratch mergeable t-digest for estimated quantiles.

The reference exposes ``estimatedMedian`` / ``estimatedQuantile`` via
t-digest MergingDigest with compression=1000
(``oshdb-api/.../TDigestReducer.java:21-41``,
``MapReducer.java:1227-1387``). This is an independent implementation
of the merging-digest algorithm (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests") with the same scale function
k(q) = delta/(2*pi) * asin(2q-1) and the same compression default.

Digests are mergeable — the distributed pattern is: one partial digest
per batch (map_batches), merge partials in a tiny reduce. Serialization
is a plain (means, weights) float64 array pair.
"""

from __future__ import annotations

import numpy as np

DEFAULT_COMPRESSION = 1000.0  # TDigestReducer.java:29


class TDigest:
    def __init__(self, compression: float = DEFAULT_COMPRESSION):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    # -- construction -------------------------------------------------
    @classmethod
    def of(cls, values: np.ndarray, compression: float = DEFAULT_COMPRESSION) -> "TDigest":
        d = cls(compression)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            v = np.sort(v)
            d.means = v
            d.weights = np.ones(len(v), dtype=np.float64)
            d._compress()
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        if self.compression != other.compression:
            # silent mixed-compression merges degrade accuracy
            # asymmetrically (a.merge(b) != b.merge(a)); the sibling
            # sketches (HLL, Misra-Gries) raise on parameter mismatch
            raise ValueError(
                f"t-digest compression mismatch: {self.compression} vs "
                f"{other.compression}"
            )
        out = TDigest(self.compression)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(out.means, kind="mergesort")
        out.means, out.weights = out.means[order], out.weights[order]
        out._compress()
        return out

    # -- internals ----------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.compression / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        """Merge sorted centroids into k-space buckets: each centroid
        covers one unit interval of k(q) (floor-bucket merging-digest
        construction — the vectorized equivalent of Dunning & Ertl's
        greedy pass; buckets are narrow near q=0/1 where k changes
        fast, preserving extreme-quantile accuracy). Fully vectorized:
        the previous per-value Python loop cost ~3 s per 200k-value
        batch in the estimated_quantiles map stage."""
        if len(self.means) <= 1:
            return
        total = self.weights.sum()
        q_left = (np.cumsum(self.weights) - self.weights) / total
        bucket = np.floor(self._k(q_left)).astype(np.int64)
        bucket -= bucket.min()
        wsum = np.bincount(bucket, weights=self.weights)
        msum = np.bincount(bucket, weights=self.means * self.weights)
        keep = wsum > 0
        self.means = msum[keep] / wsum[keep]
        self.weights = wsum[keep]

    # -- queries --------------------------------------------------------
    def quantile(self, q: float) -> float:
        """Estimated value at quantile q (0..1), linear interpolation
        between centroid means at cumulative mid-weights."""
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * total
        return float(np.interp(target, cum, self.means))

    # -- serialization (partial-aggregate transport) -------------------
    def to_bytes(self) -> bytes:
        # compression travels WITH the partial: a non-default digest
        # restored without it would silently re-compress at the
        # default on the next merge (and now trip the mismatch guard)
        return np.concatenate(
            [[self.compression], self.means, self.weights]
        ).astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, compression: float | None = None) -> "TDigest":
        arr = np.frombuffer(b, dtype="<f8")
        stored = float(arr[0])
        if compression is not None and compression != stored:
            raise ValueError(
                f"t-digest compression mismatch: stored {stored}, "
                f"requested {compression}"
            )
        d = cls(stored)
        body = arr[1:]
        n = len(body) // 2
        d.means = body[:n].copy()
        d.weights = body[n:].copy()
        return d
