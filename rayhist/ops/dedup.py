"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Target-only components for large-scale training-data pipelines. All
hashing is deterministic (no process salt) so results are identical
across workers, runs, and parallelism levels.

Shingling: 3-word shingles (``w[i] w[i+1] w[i+2]`` over a plain
whitespace split) — the same definition the DuckDB oracle uses, so the
exact-Jaccard operator is oracle-checkable; MinHash-LSH and SimHash
approximate the same similarity and are cross-checked against the
exact pairs in tests.

Scale notes (10^12 docs): the exact path's ``groupby(shingle)`` pair
explosion is quadratic in per-shingle document frequency — at scale,
drop stop-shingles above a document-frequency cap (the standard
trick) or use the MinHash path, whose shuffle volume is
O(docs x bands). Candidate verification here broadcasts the
(doc -> shingle-set) map because the corpus side is small; at scale
verification is a join of candidates back to the shingle table.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SHINGLE_N = 3
MERSENNE = (1 << 61) - 1
N_PERM = 128
LSH_BANDS = 16  # x 8 rows = 128
SIMHASH_BITS = 64


def md5_hex(texts) -> list[str]:
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def shingle_set(text: str, n: int = SHINGLE_N) -> set[str]:
    """Docs shorter than n words have NO shingles — same as the oracle's
    ``generate_series(1, len(ws)-2)``, which emits nothing for them."""
    ws = text.split(" ")
    if len(ws) < n:
        return set()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def explode_shingles(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(doc, text) -> one row per DISTINCT (doc, shingle)."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_ids, out_sh = [], []
    for i, t in zip(ids, texts):
        for s in shingle_set(t):
            out_ids.append(i)
            out_sh.append(s)
    return pa.table({id_col: pa.array(out_ids, type=batch[id_col].type), "shingle": pa.array(out_sh)})


def exact_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold_num: int = 1,
    threshold_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Exact n-gram Jaccard near-dup pairs with integer threshold test
    ``common * den >= union * num`` (no float compare). Pipeline:
    explode shingles -> groupby(shingle) pair expansion -> pair counts
    -> size join -> threshold."""
    import zlib

    def explode_with_bucket(b: pa.Table) -> pa.Table:
        t = explode_shingles(b, id_col, text_col)
        buckets = np.fromiter(
            (zlib.crc32(s.encode()) & 63 for s in t["shingle"].to_pylist()),
            dtype=np.int64,
            count=len(t),
        )
        return t.append_column("_bucket", pa.array(buckets))

    sh = docs.map_batches(explode_with_bucket, batch_format="pyarrow").materialize()
    sizes = sh.groupby(id_col).count().to_pandas().rename(columns={"count()": "n"})
    size_map = dict(zip(sizes[id_col], sizes["n"]))

    def bucket_pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized pair expansion for EVERY shingle in the bucket
        (a shingle's postings are complete within its bucket), partial
        pair counts per bucket. One Ray group call per bucket, not per
        shingle — the per-group overhead was 20x the useful work."""
        g = g.sort_values(["shingle", id_col], kind="mergesort")
        sh_v = g["shingle"].to_numpy()
        ids = g[id_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, sh_v[1:] != sh_v[:-1]])
        ends = np.r_[starts[1:], len(sh_v)]
        das, dbs = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            ii, jj = np.triu_indices(n, k=1)
            das.append(ids[s + ii])
            dbs.append(ids[s + jj])
        if not das:
            return pd.DataFrame({"doc_a": ids[:0], "doc_b": ids[:0], "common": np.array([], dtype=np.int64)})
        df = pd.DataFrame({"doc_a": np.concatenate(das), "doc_b": np.concatenate(dbs)})
        return df.groupby(["doc_a", "doc_b"], as_index=False).size().rename(columns={"size": "common"})

    # partial per-bucket counts -> driver combine (distinct pairs are
    # ~1e6 at bench scale; at 10^12 docs keep this a Dataset groupby)
    partials = (
        sh.groupby("_bucket")
        .map_groups(lambda g: bucket_pair_counts(g.drop(columns=["_bucket"])), batch_format="pandas")
        .to_pandas()
    )
    pair_counts = partials.groupby(["doc_a", "doc_b"], as_index=False)["common"].sum()
    pair_counts["un"] = (
        pair_counts["doc_a"].map(size_map) + pair_counts["doc_b"].map(size_map) - pair_counts["common"]
    ).astype("int64")
    hit = pair_counts[pair_counts["common"] * threshold_den >= pair_counts["un"] * threshold_num]
    return (
        hit.sort_values(["doc_a", "doc_b"])[["doc_a", "doc_b", "common", "un"]]
        .reset_index(drop=True)
    )


class MinHashStage:
    """Actor-pool stage: per-document MinHash signature + LSH band keys.

    Permutation parameters are derived deterministically in __init__
    (once per actor); per batch the work is a vectorized
    (shingles x perms) min-reduce.
    """

    def __init__(self, n_perm: int = N_PERM, bands: int = LSH_BANDS):
        rng = np.random.default_rng(0xD1CE)
        self.a = rng.integers(1, MERSENNE, n_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.bands = bands
        self.rows = n_perm // bands

    def signature(self, shingles: set[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.n_perm, MERSENNE, dtype=np.uint64)
        h = np.array([_hash64(s) for s in shingles], dtype=np.uint64)
        # (a*h + b) mod p, vectorized over (n_shingles, n_perm)
        prod = (h[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(MERSENNE)
        return prod.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, t in zip(ids, texts):
            sig = self.signature(shingle_set(t))
            for b in range(self.bands):
                chunk = sig[b * self.rows : (b + 1) * self.rows]
                key = hashlib.md5(chunk.tobytes() + bytes([b])).hexdigest()[:16]
                out_id.append(i)
                out_band.append(b)
                out_key.append(key)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=batch["doc_id"].type),
                "band": pa.array(out_band, type=pa.int32()),
                "key": pa.array(out_key),
            }
        )


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs: shingle -> minhash -> band ->
    groupby(band, key) candidate pairs -> exact-Jaccard verification.

    Verification broadcasts the doc->shingle-set map (small corpus); at
    scale it becomes a join of the candidate list against the shingle
    table (see module docstring).
    """
    cand = (
        docs.map_batches(MinHashStage, batch_format="pyarrow", concurrency=(1, 8))
        .groupby(["band", "key"])
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "doc_a": np.sort(g["doc_id"].to_numpy())[np.triu_indices(len(g), k=1)[0]],
                    "doc_b": np.sort(g["doc_id"].to_numpy())[np.triu_indices(len(g), k=1)[1]],
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .drop_duplicates()
    )
    texts = docs.select_columns(["doc_id", "text"]).to_pandas()
    sets = {r.doc_id: shingle_set(r.text) for r in texts.itertuples()}
    rows = []
    for a, b in cand.itertuples(index=False):
        sa, sb = sets[a], sets[b]
        common = len(sa & sb)
        un = len(sa | sb)
        if un and common * threshold_den >= un * threshold_num:
            rows.append((a, b, common, un))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "common", "un"])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash64(shingles: set[str]) -> int:
    """Unweighted 64-bit SimHash over shingle hashes."""
    if not shingles:
        return 0
    h = np.array([_hash64(s) for s in shingles], dtype=np.uint64)
    bits = (h[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = bits.sum(axis=0) * 2 > len(h)
    return int(votes.astype(np.uint64) @ (np.uint64(1) << np.arange(SIMHASH_BITS, dtype=np.uint64)))


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints bucketed by 4
    16-bit chunks (any pair within hamming<=3 shares at least one of 4
    chunks by pigeonhole), verified by exact hamming distance."""

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sh = [simhash64(shingle_set(t)) for t in batch["text"].to_pylist()]
        out_id, out_chunk, out_key, out_sig = [], [], [], []
        for i, s in zip(ids, sh):
            for c in range(4):
                out_id.append(i)
                out_chunk.append(c)
                out_key.append((s >> (16 * c)) & 0xFFFF)
                out_sig.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=batch["doc_id"].type),
                "chunk": pa.array(out_chunk, type=pa.int32()),
                "key": pa.array(out_key, type=pa.int64()),
                "sig": pa.array(np.array(out_sig, dtype=np.uint64).view(np.int64)),
            }
        )

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy().astype(np.int64).view(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = np.array(
            [bin(int(sigs[a]) ^ int(sigs[b])).count("1") for a, b in zip(ii, jj)], dtype=np.int64
        ) if len(ii) else np.array([], dtype=np.int64)
        ok = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[ii[ok]], "doc_b": ids[jj[ok]], "hamming": ham[ok]})

    out = (
        docs.map_batches(stage, batch_format="pyarrow")
        .groupby(["chunk", "key"])
        .map_groups(pairs_of_group, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(subset=["doc_a", "doc_b"])
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def exact_dedup(docs: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Exact dedup: content-hash column -> groupby(hash) -> keep the
    row with the smallest id (hash-partition + per-group first)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column("_h", pa.array(md5_hex(batch[text_col].to_pylist())))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return (
        docs.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(first, batch_format="pandas")
        .drop_columns(["_h"])
    )


def embedding_dup_pairs(
    embeddings: ray.data.Dataset,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= tau, i < j).

    The L2-normalized corpus matrix is broadcast via ``ray.put`` once;
    each batch computes one (batch x corpus) matmul and emits only its
    above-threshold pairs — O(n^2/blocks) work per batch, no shuffle.
    At 10^12 scale this brute-force kernel runs per IVF bucket (see
    rayhist.spatial.knn.ann_cosine_ivf) instead of per corpus.
    """
    import ray

    full = embeddings.to_pandas().sort_values(id_col)
    ids_all = full[id_col].to_numpy(dtype=np.int64)
    mat_all = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat_all /= np.linalg.norm(mat_all, axis=1, keepdims=True)
    ref = ray.put((ids_all, mat_all))

    class PairStage:
        def __init__(self):
            self.ids_all, self.mat_all = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            mat = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ self.mat_all.T
            bi, cj = np.nonzero(sims >= tau)
            a, b = ids[bi], self.ids_all[cj]
            keep = a < b  # canonical orientation, no self/dup pairs
            return pd.DataFrame(
                {
                    "vec_a": a[keep],
                    "vec_b": b[keep],
                    "cos_sim": sims[bi[keep], cj[keep]],
                }
            )

    out = embeddings.map_batches(PairStage, batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
