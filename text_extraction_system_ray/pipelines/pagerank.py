"""Distributed PageRank over the corpus link graph — the iterative-
algorithm op class (web-graph centrality is the canonical crawl-corpus
curation signal: rank-weighted sampling, seed-list building).

Graph planting (documents have no real hyperlinks between each other,
so the edge list is a pure deterministic function of ``doc_id``,
mirrored exactly in the SQL oracle — the pii/mixture planting
pattern): node ``u`` has out-degree ``deg(u) = 1 + u % 4`` and its
j-th edge (j = 0..deg-1) points at ``(u*31 + 17 + j*7919) % n``.
Self-loops and multi-edges are kept (PageRank is well-defined on
both) — no exclusion rule to mirror.

Arithmetic is EXACT-INTEGER so the fixed-point result is independent
of summation order (the scaled-int trick from ``source_stats``):
ranks live in units of 1e-9 (``SCALE = 10**9``), each iteration is

    r'(v) = 0.15*SCALE + (85 * sum_{u->v} (r(u) // deg(u))) // 100

with floor division throughout.  Integer sums commute, so engine
groupby order and oracle aggregation order cannot diverge; the bound
``85 * n * SCALE < 2**63`` holds to n ≈ 1.2e8 nodes per this SCALE
(drop SCALE for bigger graphs).

Scale shape: the edge list is materialized once (at 100 TB it is a
Parquet dataset, here an in-object-store Dataset) and re-streamed per
iteration; the rank vector is broadcast via ``ray.put`` (8 MB per 1M
nodes) and per-batch contributions are pre-combined by ``np.unique``
before the per-iteration ``groupby(dst).sum`` — the shuffle moves one
(dst, contrib) row per distinct dst per batch.  Beyond
``RANK_BROADCAST_LIMIT`` nodes the vector no longer broadcasts;
``pagerank_ranks_ds`` implements the at-scale plan — ranks
co-partitioned with edges by hash(src), one ``Dataset.join`` per
iteration, no driver rank vector — the same partition-key-reuse note
as ``textindex``'s posting lists. Both plans are bit-equal (pinned by
test_pagerank_split).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SCALE = 10 ** 9
DAMP_NUM, DAMP_DEN = 85, 100
TELEPORT = 15 * SCALE // 100
ITERATIONS = 10
TOP_K = 20
# rank vector is broadcast below this node count (8 MB per 1M nodes);
# above it the co-partitioned join plan applies (module docstring)
RANK_BROADCAST_LIMIT = 100_000_000


def _edges_batch(t: pa.Table, n: int) -> pa.Table:
    """Planted edge list for one batch of nodes (vectorized)."""
    u = t.column("doc_id").to_numpy()
    deg = 1 + (u % 4)
    src = np.repeat(u, deg)
    # j index within each node's edge block
    ptr = np.concatenate([[0], np.cumsum(deg)])
    j = np.arange(ptr[-1]) - np.repeat(ptr[:-1], deg)
    dst = (src * 31 + 17 + j * 7919) % n
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64()),
                     "deg": pa.array(np.repeat(deg, deg), pa.int64())})


class _Contrib:
    """Per-batch edge contributions, pre-combined by dst."""

    def __init__(self, ranks_ref):
        self.ranks = ray.get(ranks_ref) if not isinstance(
            ranks_ref, np.ndarray) else ranks_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        deg = t.column("deg").to_numpy()
        c = self.ranks[src] // deg
        # exact int64 segment sums (bincount weights detour through
        # float64, which loses exactness past 2**53 total mass)
        order = np.argsort(dst, kind="stable")
        ds_, cs_ = dst[order], c[order]
        starts = np.concatenate([[0], np.flatnonzero(
            np.diff(ds_)) + 1]) if len(ds_) else np.zeros(0, np.int64)
        sums = (np.add.reduceat(cs_, starts)
                if len(ds_) else np.zeros(0, np.int64))
        return pa.table({
            "dst": pa.array(ds_[starts], pa.int64()),
            "c": pa.array(sums, pa.int64())})


def pagerank_ranks(sf_dir: str, iterations: int = ITERATIONS,
                   n_override: int | None = None) -> np.ndarray:
    """Final integer rank vector after ``iterations`` exact-int steps
    (broadcast plan — requires n ≤ ``RANK_BROADCAST_LIMIT``)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = n_override if n_override is not None else int(ds.count())
    if n > RANK_BROADCAST_LIMIT:
        raise ValueError(
            "rank vector exceeds broadcast budget; use "
            "pagerank_ranks_ds (co-partitioned join plan)")
    edges = ds.map_batches(lambda t: _edges_batch(t, n),
                           batch_format="pyarrow").materialize()
    ranks = np.full(n, SCALE, np.int64)
    for _ in range(iterations):
        ref = ray.put(ranks)
        agg = (edges.map_batches(
            _Contrib, fn_constructor_kwargs={"ranks_ref": ref},
            batch_format="pyarrow", batch_size=8192, concurrency=(1, 8))
            .groupby("dst").sum("c").to_pandas())
        s = np.zeros(n, np.int64)
        s[agg["dst"].to_numpy()] = agg["sum(c)"].to_numpy()
        ranks = TELEPORT + (DAMP_NUM * s) // DAMP_DEN
    return ranks


def _rank_join_partitions() -> int:
    from .util import join_partitions
    return join_partitions()


def pagerank_ranks_ds(sf_dir: str, iterations: int = ITERATIONS,
                      n_override: int | None = None) -> ray.data.Dataset:
    """The at-scale plan (VERDICT r4 item 4): NO driver rank vector.

    Ranks live as a ``(node, rank)`` Dataset; each iteration is one
    hash-partitioned ``Dataset.join`` of the materialized edge list
    with the rank table on ``src = node`` (ranks co-partitioned with
    edges by hash(src)), a per-batch dst-combiner, and one
    ``groupby(dst).sum`` — zero-contribution nodes are restored by
    unioning a node-sized zero table before the groupby (cheaper than a
    second outer join). Arithmetic is the identical exact-int
    recurrence, so the result is bit-equal to the broadcast plan
    (pinned by test_pagerank_split).

    Partitioning assumption: both shuffles key on the same node-id hash
    every iteration, so a cluster-pinned partitioning scheme reuses the
    edge placement across all iterations."""
    nodes = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
    n = n_override if n_override is not None else int(nodes.count())
    nparts = _rank_join_partitions()
    edges = nodes.map_batches(lambda t: _edges_batch(t, n),
                              batch_format="pyarrow").materialize()
    zeros = nodes.map_batches(
        lambda t: pa.table({"dst": t.column("doc_id"),
                            "c": pa.array(np.zeros(t.num_rows, np.int64),
                                          pa.int64())}),
        batch_format="pyarrow").materialize()
    ranks = nodes.map_batches(
        lambda t: pa.table({"node": t.column("doc_id"),
                            "rank": pa.array(
                                np.full(t.num_rows, SCALE, np.int64),
                                pa.int64())}),
        batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        dst = t.column("dst").to_numpy()
        c = t.column("rank").to_numpy() // t.column("deg").to_numpy()
        order = np.argsort(dst, kind="stable")
        ds_, cs_ = dst[order], c[order]
        starts = np.concatenate([[0], np.flatnonzero(
            np.diff(ds_)) + 1]) if len(ds_) else np.zeros(0, np.int64)
        sums = (np.add.reduceat(cs_, starts)
                if len(ds_) else np.zeros(0, np.int64))
        return pa.table({"dst": pa.array(ds_[starts], pa.int64()),
                         "c": pa.array(sums, pa.int64())})

    def step(t: pa.Table) -> pa.Table:
        s = t.column("sum(c)").to_numpy()
        return pa.table({
            "node": t.column("dst"),
            "rank": pa.array(TELEPORT + (DAMP_NUM * s) // DAMP_DEN,
                             pa.int64())})

    for _ in range(iterations):
        joined = edges.join(ranks, join_type="inner",
                            num_partitions=nparts,
                            on=("src",), right_on=("node",))
        ranks = (joined.map_batches(contrib, batch_format="pyarrow")
                 .union(zeros)
                 .groupby("dst").sum("c")
                 .map_batches(step, batch_format="pyarrow")
                 .materialize())
    return ranks


def pagerank_topk(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """Top-k docs by PageRank: (doc_id, rank_units), rank desc, ties by
    doc_id asc. Routes through the broadcast plan below
    ``RANK_BROADCAST_LIMIT`` nodes, else the co-partitioned join plan
    with a per-batch top-k combiner (only ≤ k candidate rows per block
    ever reach the driver)."""
    nodes = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
    n = int(nodes.count())
    if n <= RANK_BROADCAST_LIMIT:
        ranks = pagerank_ranks(sf_dir)
        order = np.lexsort((np.arange(len(ranks)), -ranks))[:k]
        return pd.DataFrame({"doc_id": order.astype(np.int64),
                             "rank_units": ranks[order]})
    rds = pagerank_ranks_ds(sf_dir)

    def topk_batch(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        rank = t.column("rank").to_numpy()
        keep = np.lexsort((node, -rank))[:k]
        return pa.table({"node": pa.array(node[keep], pa.int64()),
                         "rank": pa.array(rank[keep], pa.int64())})

    cand = rds.map_batches(topk_batch, batch_format="pyarrow").to_pandas()
    node = cand["node"].to_numpy()
    rank = cand["rank"].to_numpy()
    keep = np.lexsort((node, -rank))[:k]
    return pd.DataFrame({"doc_id": node[keep].astype(np.int64),
                         "rank_units": rank[keep].astype(np.int64)})
