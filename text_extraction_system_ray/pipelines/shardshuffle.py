"""Deterministic training-shard shuffle: assign every document a
shard and a position inside it, equivalent to a global random
permutation but reproducible and shuffle-light.

Pretraining wants the corpus "globally shuffled" into N shard files.
``Dataset.random_shuffle`` is a full all-to-all over the payload and
is non-deterministic; the standard at-scale trick is a HASH shuffle:
``key = md5(doc_id)`` is effectively a random permutation of the key
space, so ``shard = key % N`` balances shards and ``ORDER BY key
WITHIN shard`` is a uniform random order — fully deterministic,
resumable, and the payload moves exactly once (to its shard writer).

Engine shape:

1. one ``map_batches`` computes ``(doc_id, key, shard)`` — 24-byte
   rows; the payload does NOT participate in the ranking.
2. per-shard positions via the two-level scan: ``groupby(shard)``
   over per-(shard, key-bucket) count partials gives each bucket's
   base rank (driver prefix-sum per shard over ~N×buckets tiny rows);
   within-bucket rank is a vectorized argsort.  A real run would then
   hash-partition the payload by ``shard`` and write one file per
   shard, sorted by ``key`` — positions are the join-free write plan.

Output: ``(doc_id, shard, pos)`` where ``pos`` is the 0-based rank of
``key`` inside the shard (ties impossible: md5 keyed by the unique
doc_id).  The SQL oracle recomputes the same with one window function.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from .decontam import _md5_low64      # vectorized (DuckDB md5 kernel)

N_SHARDS = 8
KEY_BUCKETS = 64            # rank sub-buckets per shard (key high bits)


def _keys(ids: np.ndarray) -> np.ndarray:
    return _md5_low64([str(int(d)) for d in ids])


def _rows_and_partials(t: pa.Table, n_shards: int) -> pa.Table:
    ids = t.column("doc_id").to_numpy()
    key = _keys(ids)
    shard = (key % n_shards).astype(np.int64)
    kb = (key >> np.uint64(58)).astype(np.int64)     # top 6 bits
    gkey = shard * KEY_BUCKETS + kb
    ug, inv = np.unique(gkey, return_inverse=True)
    cnt = np.bincount(inv)
    return pa.table({
        "doc_id": pa.array(np.concatenate(
            [ids, np.full(len(ug), -1)]), pa.int64()),
        "gkey": pa.array(np.concatenate([gkey, ug]), pa.int64()),
        "key": pa.array(np.concatenate(
            [key.view(np.int64), cnt]), pa.int64())})


def _rank_group(g: pd.DataFrame, bases) -> pd.DataFrame:
    g = g[g["doc_id"] >= 0]
    if len(g) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "shard": pd.Series([], dtype="int64"),
                             "pos": pd.Series([], dtype="int64")})
    gk = int(g["gkey"].iloc[0])
    base = bases.get(gk, 0)
    key = g["key"].to_numpy().view(np.uint64)
    order = np.argsort(key, kind="stable")
    pos = np.empty(len(g), np.int64)
    pos[order] = base + np.arange(len(g))
    return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                         "shard": np.full(len(g), gk // KEY_BUCKETS,
                                          np.int64),
                         "pos": pos})


def _driver_finish(rows: "ray.data.Dataset",
                   n_shards: int) -> pd.DataFrame:
    """Small-corpus finish: one lexsort on the driver (the
    ``exact_dedup`` adaptive pattern; the compact rows are 24 B/doc)."""
    t = rows.to_pandas()
    t = t[t["doc_id"] >= 0]
    ids = t["doc_id"].to_numpy()
    key = t["key"].to_numpy().view(np.uint64)
    shard = (key % n_shards).astype(np.int64)
    order = np.lexsort((key, shard))
    pos = np.empty(len(t), np.int64)
    pos[order] = np.arange(len(t))
    starts = np.searchsorted(shard[order], np.arange(n_shards))
    pos -= starts[shard]                    # rank within shard
    return (pd.DataFrame({"doc_id": ids, "shard": shard, "pos": pos})
            .sort_values("doc_id").reset_index(drop=True))


def shard_shuffle(sf_dir: str, n_shards: int = N_SHARDS):
    """(doc_id, shard, pos): deterministic random-order shard layout."""
    from .dedup import DRIVER_GROUP_DOC_LIMIT, _n_docs
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    rows = ds.map_batches(lambda t: _rows_and_partials(t, n_shards),
                          batch_format="pyarrow").materialize()
    if _n_docs(sf_dir) <= DRIVER_GROUP_DOC_LIMIT:
        return _driver_finish(rows, n_shards)
    totals = (rows.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 0))
                   .select(["gkey", "key"]), batch_format="pyarrow")
        .groupby("gkey").aggregate(Sum("key")).to_pandas())
    totals = totals.sort_values("gkey")
    gk = totals["gkey"].to_numpy()
    cnt = totals["sum(key)"].to_numpy()
    # per-shard exclusive prefix over that shard's key buckets
    base = np.zeros(len(gk), np.int64)
    for s in np.unique(gk // KEY_BUCKETS):
        m = gk // KEY_BUCKETS == s
        c = cnt[m]
        base[m] = np.concatenate([[0], np.cumsum(c)[:-1]])
    bases_ref = ray.put(dict(zip(gk.astype(int), base)))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        return _rank_group(g, ray.get(bases_ref))

    return (rows.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 0)),
        batch_format="pyarrow")
        .groupby("gkey").map_groups(rank, batch_format="pandas")
        .select_columns(["doc_id", "shard", "pos"])
        .sort("doc_id"))
