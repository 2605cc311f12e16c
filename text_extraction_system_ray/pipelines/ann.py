"""Similarity search over the ``embeddings`` table (list<float> column).

- ``cosine_topk``: brute-force cosine top-k — the exactness baseline.
  Query matrix is broadcast once (``ray.put``); each batch does one
  float64 matmul against it and emits per-batch partial top-k rows; the
  tiny partial set is reduced with a final per-query top-k. Scales: the
  shuffle carries only ``batches × queries × k`` candidate rows.
- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH buckets
  restrict the scan to colliding buckets (probing all 1-bit-flip
  neighbors), then exact cosine re-rank within candidates.
- ``embedding_neardup_pairs``: all-pairs cosine near-duplicate detection
  (the embedding-cosine dedup arm), brute-force per batch vs broadcast
  normalized matrix.

Determinism: ranking uses cosine rounded to 6 dp with vec_id tie-break —
matching the DuckDB oracle's ORDER BY exactly.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from .util import round_half_up

_N_QUERIES = 5
_K = 10
_PLANES = 8    # LSH hyperplanes → 256 buckets


def _embeddings_matrix(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _query_matrix(sf_dir: str) -> tuple:
    """Deterministic queries: the embeddings of vec_id < _N_QUERIES."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", _N_QUERIES)])
    qids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    q = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(qids)
    return qids[order], q[order]


def cosine_topk(sf_dir: str, k: int = _K) -> pd.DataFrame:
    """Brute-force exact top-k: (query_id, vec_id, cos) — k rows/query."""
    qids, q = _query_matrix(sf_dir)
    qn = _normalize(q)
    q_ref = ray.put((qids, qn))

    class Score:
        def __init__(self):
            self.qids, self.qn = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
            m = _normalize(np.asarray(t.column("embedding").to_pylist(),
                                      dtype=np.float64))
            sims = m @ self.qn.T                     # (batch, n_queries)
            out_q, out_v, out_c = [], [], []
            for j, qid in enumerate(self.qids):
                col = round_half_up(sims[:, j], 6)
                # partial top-k within the batch (tie-break by vec_id asc)
                order = np.lexsort((ids, -col))[:k]
                out_q.extend([qid] * len(order))
                out_v.extend(ids[order].tolist())
                out_c.extend(col[order].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "vec_id": pa.array(out_v, pa.int64()),
                             "cos": pa.array(out_c, pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(Score, batch_format="pyarrow",
                              concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"],
                          ascending=[False, True]).head(k)
        return g

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pandas").to_pandas() \
        .sort_values(["query_id", "cos", "vec_id"],
                     ascending=[True, False, True]).reset_index(drop=True)


def lsh_cosine_topk(sf_dir: str, k: int = _K) -> pd.DataFrame:
    """LSH-bucketed ANN: random-hyperplane signatures; scan buckets that
    match a query signature exactly or within Hamming 1, exact re-rank.
    Approximate: recall measured in tests against cosine_topk."""
    rng = np.random.RandomState(42)
    qids, q = _query_matrix(sf_dir)
    qn = _normalize(q)
    dim = qn.shape[1]
    planes = rng.normal(size=(dim, _PLANES))
    q_sig = (qn @ planes > 0).astype(np.uint8)
    q_buckets = q_sig @ (1 << np.arange(_PLANES, dtype=np.uint32))
    # multiprobe: query bucket + all 1-bit and 2-bit flips (recall/scan
    # trade-off: ~15% of buckets scanned at 8 planes)
    cand_buckets = set()
    for b in q_buckets.tolist():
        cand_buckets.add(int(b))
        for bit in range(_PLANES):
            cand_buckets.add(int(b) ^ (1 << bit))
            for bit2 in range(bit + 1, _PLANES):
                cand_buckets.add(int(b) ^ (1 << bit) ^ (1 << bit2))
    ref = ray.put((qids, qn, planes, cand_buckets))

    class BucketScore:
        def __init__(self):
            self.qids, self.qn, self.planes, self.cands = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
            m = _normalize(np.asarray(t.column("embedding").to_pylist(),
                                      dtype=np.float64))
            sig = (m @ self.planes > 0).astype(np.uint8)
            buckets = sig @ (1 << np.arange(_PLANES, dtype=np.uint32))
            mask = np.isin(buckets, list(self.cands))
            ids, m = ids[mask], m[mask]
            if len(ids) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            sims = m @ self.qn.T
            out_q, out_v, out_c = [], [], []
            for j, qid in enumerate(self.qids):
                col = round_half_up(sims[:, j], 6)
                order = np.lexsort((ids, -col))[:_K]
                out_q.extend([qid] * len(order))
                out_v.extend(ids[order].tolist())
                out_c.extend(col[order].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "vec_id": pa.array(out_v, pa.int64()),
                             "cos": pa.array(out_c, pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(BucketScore, batch_format="pyarrow",
                              concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos", "vec_id"],
                             ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pandas").to_pandas() \
        .sort_values(["query_id", "cos", "vec_id"],
                     ascending=[True, False, True]).reset_index(drop=True)


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.35) -> pd.DataFrame:
    """All-pairs cosine near-dups: per-batch matmul against the broadcast
    normalized full matrix; emit (id_a < id_b, cos >= threshold). At larger
    scale the matrix side becomes LSH buckets (same signatures as above)."""
    ids_all, mat = _embeddings_matrix(sf_dir)
    mn = _normalize(mat)
    ref = ray.put((ids_all, mn))

    class Pairs:
        def __init__(self):
            self.ids_all, self.mn = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
            m = _normalize(np.asarray(t.column("embedding").to_pylist(),
                                      dtype=np.float64))
            sims = m @ self.mn.T
            rows_a, rows_b, cs = [], [], []
            for i in range(len(ids)):
                hit = np.where(round_half_up(sims[i], 6) >= threshold)[0]
                for j in hit:
                    if self.ids_all[j] > ids[i]:
                        rows_a.append(int(ids[i]))
                        rows_b.append(int(self.ids_all[j]))
                        cs.append(float(round_half_up(sims[i, j], 6)))
            return pa.table({"id_a": pa.array(rows_a, pa.int64()),
                             "id_b": pa.array(rows_b, pa.int64()),
                             "cos": pa.array(cs, pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    df = ds.map_batches(Pairs, batch_format="pyarrow",
                        concurrency=(1, 4)).to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cos": pd.Series([], dtype="float64")})
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _kmeans_lite(mat: np.ndarray, k: int, iters: int = 8,
                 seed: int = 42) -> np.ndarray:
    """Deterministic seeded k-means on normalized vectors (driver-side,
    runs on a bounded sample — the index-build step of IVF)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(mat), size=min(k, len(mat)), replace=False)
    centroids = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for j in range(len(centroids)):
            members = mat[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    centroids[j] = c / n
    return centroids


def ivf_cosine_topk(sf_dir: str, k: int = _K, n_lists: int = 16,
                    n_probe: int = 4) -> pd.DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer built once on a
    driver-side sample, broadcast; each batch scans only vectors whose
    nearest centroid is among the query's ``n_probe`` closest lists, then
    exact cosine re-rank. The at-scale layout would hash-partition the
    corpus by list id so probes touch only matching partitions."""
    ids_all, mat = _embeddings_matrix(sf_dir)
    sample = _normalize(mat[:4096])
    centroids = _kmeans_lite(sample, n_lists)
    qids, q = _query_matrix(sf_dir)
    qn = _normalize(q)
    probe_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    probe_set = set(probe_lists.reshape(-1).tolist())
    ref = ray.put((qids, qn, centroids, probe_set))

    class IvfScore:
        def __init__(self):
            self.qids, self.qn, self.centroids, self.probe = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
            m = _normalize(np.asarray(t.column("embedding").to_pylist(),
                                      dtype=np.float64))
            lists = np.argmax(m @ self.centroids.T, axis=1)
            mask = np.isin(lists, list(self.probe))
            ids, m = ids[mask], m[mask]
            if len(ids) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            sims = m @ self.qn.T
            out_q, out_v, out_c = [], [], []
            for j, qid in enumerate(self.qids):
                col = round_half_up(sims[:, j], 6)
                order = np.lexsort((ids, -col))[:_K]
                out_q.extend([qid] * len(order))
                out_v.extend(ids[order].tolist())
                out_c.extend(col[order].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "vec_id": pa.array(out_v, pa.int64()),
                             "cos": pa.array(out_c, pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    partials = ds.map_batches(IvfScore, batch_format="pyarrow",
                              concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos", "vec_id"],
                             ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pandas").to_pandas() \
        .sort_values(["query_id", "cos", "vec_id"],
                     ascending=[True, False, True]).reset_index(drop=True)
