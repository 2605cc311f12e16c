"""Retrieval / corpus-shaping operators over the ``documents`` table.

Training-data pipelines need keyword retrieval (mine documents matching
a query) and deterministic rebalancing (stratified sampling) on top of
the dedup/quality ops. Both are expressed scale-first and are
SQL-checkable end-to-end:

- **BM25 top-k** (Okapi BM25, k1=1.2, b=0.75, Lucene-style
  ``ln(1 + (N-df+0.5)/(df+0.5))`` idf): ONE scan computes per-doc
  (dl, tf per query term) into a compact materialized intermediate
  (~40 B/doc — text never leaves the stage); corpus stats (N, avgdl,
  df) come from aggregates over that intermediate; scoring + per-batch
  partial top-k runs over the same cached blocks with the tiny stats
  broadcast. Nothing text-sized shuffles, no second corpus read.
- **Stratified sample**: deterministic hash-based thinning with
  per-language keep rates — ``md5_low64(doc_id) % 100 < rate[lang]``.
  Pure map-side filter (embarrassingly parallel, partition-stable,
  reproducible across cluster sizes); the md5 decision function is the
  same one the DuckDB oracle computes.
"""
from __future__ import annotations

import hashlib
import math
from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .util import round_half_up

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS: Tuple[str, ...] = ("spark", "window", "join")

# per-language keep rates (percent): downsample the dominant language,
# keep the tail — the classic corpus-rebalancing shape
SAMPLE_RATES: Dict[str, int] = {"en": 5, "de": 20, "zh": 20,
                                "fr": 20, "es": 20}


def _doc_term_stats(terms: Sequence[str]):
    """Batch fn: per-doc token length + per-term frequency, vectorized —
    one flat token pass, term counts via masked segment sums."""
    terms = tuple(terms)

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        tok_lists = [(x or "").lower().split() for x in texts]
        lens = np.fromiter((len(x) for x in tok_lists), np.int64,
                           len(tok_lists))
        ptr = np.zeros(len(tok_lists) + 1, np.int64)
        np.cumsum(lens, out=ptr[1:])
        flat = np.asarray([w for toks in tok_lists for w in toks],
                          dtype=object)
        cols = {"doc_id": t["doc_id"],
                "dl": pa.array(lens, pa.int64())}
        for i, term in enumerate(terms):
            if len(flat):
                # segment sums via cumsum differencing: exact for empty
                # segments anywhere in the batch (a clipped reduceat
                # corrupts the PREVIOUS doc's tf when the batch ends with
                # an empty-text doc — ADVICE r3)
                cs = np.concatenate([[0], (flat == term).cumsum()])
                tf = (cs[ptr[1:]] - cs[ptr[:-1]]).astype(np.int64)
            else:
                tf = np.zeros(len(tok_lists), np.int64)
            cols[f"tf{i}"] = pa.array(tf, pa.int64())
        return pa.table(cols)

    return fn


def bm25_topk(sf_dir: str, terms: Sequence[str] = BM25_TERMS,
              k: int = 10, k1: float = BM25_K1,
              b: float = BM25_B) -> pd.DataFrame:
    """Top-k documents by Okapi BM25 for a fixed query-term set.

    Returns (doc_id, score) — score rounded to 4 dp, ranking on the
    unrounded double with doc_id tie-break, matching the DuckDB oracle's
    ORDER BY exactly."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    stats_ds = ds.map_batches(_doc_term_stats(terms),
                              batch_format="pyarrow").materialize()

    aggs = [Count(alias_name="n"), Sum("dl", alias_name="sum_dl")]
    # df per term: docs with tf > 0 — computed as a sum of indicators
    def add_nz(t: pa.Table) -> pa.Table:
        for i in range(len(terms)):
            t = t.append_column(
                f"nz{i}", pc.cast(pc.greater(t[f"tf{i}"], 0), pa.int64()))
        return t

    with_nz = stats_ds.map_batches(add_nz, batch_format="pyarrow")
    for i in range(len(terms)):
        aggs.append(Sum(f"nz{i}", alias_name=f"df{i}"))
    g = with_nz.aggregate(*aggs)
    n = int(g["n"])
    avgdl = float(g["sum_dl"]) / max(n, 1)
    dfs = [int(g[f"df{i}"]) for i in range(len(terms))]
    idfs = [math.log((n - df + 0.5) / (df + 0.5) + 1.0) for df in dfs]
    params_ref = ray.put((np.asarray(idfs, np.float64), avgdl, k1, b))

    def score_batch(t: pa.Table) -> pa.Table:
        idf, avg, kk1, bb = ray.get(params_ref)
        dl = t["dl"].to_numpy().astype(np.float64)
        norm = kk1 * (1.0 - bb + bb * dl / avg)
        score = np.zeros(len(dl), np.float64)
        for i in range(len(idf)):
            tf = t[f"tf{i}"].to_numpy().astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                part = np.where(tf > 0,
                                idf[i] * tf * (kk1 + 1.0) / (tf + norm),
                                0.0)
            score += part
        ids = t["doc_id"].to_numpy()
        order = np.lexsort((ids, -score))[:k]       # partial top-k
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "score": pa.array(score[order], pa.float64())})

    parts = stats_ds.map_batches(score_batch,
                                 batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(k)
    parts["score"] = round_half_up(parts["score"], 4)
    return parts.reset_index(drop=True)


def stratified_sample(sf_dir: str,
                      rates: Dict[str, int] = SAMPLE_RATES
                      ) -> pd.DataFrame:
    """Deterministic per-language sampling: keep a doc iff
    ``md5_low64(str(doc_id)) % 100 < rates[lang]`` (unknown languages
    keep everything). Returns the sampled (doc_id, lang) rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    rates_ref = ray.put(dict(rates))

    def filt(t: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(d).encode()).digest()[:8], "big") % 100
             for d in ids), np.int64, len(ids))
        thresh = np.fromiter((r.get(lg, 100) for lg in langs), np.int64,
                             len(langs))
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(filt, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
