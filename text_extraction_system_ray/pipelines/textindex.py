"""Inverted text index: partitioned posting lists + pruned-read lookup.

The retrieval-side counterpart of ``ann.ivf_build_index``: build once,
then serve term lookups by reading ONLY the partitions that can contain
the query terms.  Postings are ``(term, doc_id, tf)`` rows partitioned
by a deterministic SipHash of the term (``pd.util.hash_array``, fixed
key — identical on build and query side), written with the same
resumable one-directory-per-partition Parquet layout the checkpoint
sink and IVF index use.  A lookup for ``q`` terms touches at most ``q``
of the ``n_parts`` partitions regardless of corpus size.

Query semantics: conjunctive (AND) match — docs containing EVERY query
term, scored by summed term frequency.  The post-filter aggregation is
partition-batched by doc (one vectorized kernel per doc-partition,
never one Python group per doc).
"""
from __future__ import annotations

import json
import os
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

N_PARTS = 32
QUERY_TERMS = ("scan", "column")


def _term_parts(terms: np.ndarray, n_parts: int) -> np.ndarray:
    return (pd.util.hash_array(terms.astype(object))
            % n_parts).astype(np.int64)


def build_text_index(sf_dir: str, index_dir: str,
                     n_parts: int = N_PARTS) -> dict:
    """documents → term-partitioned posting lists on disk."""

    def postings(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        toks: List[str] = []
        docs: List[int] = []
        for d, x in zip(ids, texts):
            tt = (x or "").lower().split()
            toks.extend(tt)
            docs.extend([d] * len(tt))
        if not toks:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        terms = np.asarray(toks, dtype=object)
        ut, t_inv = np.unique(terms.astype(str), return_inverse=True)
        darr = np.asarray(docs, np.int64)
        ud, d_inv = np.unique(darr, return_inverse=True)
        key = d_inv.astype(np.int64) * len(ut) + t_inv
        uk, tf = np.unique(key, return_counts=True)
        out_t = ut[uk % len(ut)]
        out_d = ud[uk // len(ut)]
        return pa.table({
            "term": pa.array(out_t, pa.string()),
            "doc_id": pa.array(out_d, pa.int64()),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "part": pa.array(_term_parts(out_t, n_parts), pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(postings, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["part"])
    meta = {"n_parts": int(n_parts)}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def query_text_index(index_dir: str,
                     terms: Sequence[str] = QUERY_TERMS
                     ) -> ray.data.Dataset:
    """AND-lookup reading only the query terms' partitions."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        n_parts = json.load(f)["n_parts"]
    tarr = np.asarray(list(terms), dtype=object)
    need = sorted(set(_term_parts(tarr, n_parts).tolist()))
    paths = []
    for p in need:
        d = os.path.join(index_dir, f"part={p}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    n_terms = len(set(terms))
    if not paths:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "total_tf": pa.array([], pa.int64())}))
    term_set = pa.array(sorted(set(terms)))

    def filt(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["term"], value_set=term_set)
        t = t.filter(m)
        # per-batch partial: (doc, matched-term count, tf sum)
        ids = t.column("doc_id").to_numpy()
        ud, inv = np.unique(ids, return_inverse=True)
        nt = np.zeros(len(ud), np.int64)
        tf = np.zeros(len(ud), np.int64)
        np.add.at(nt, inv, 1)
        np.add.at(tf, inv, t.column("tf").to_numpy())
        return pa.table({
            "doc_id": pa.array(ud, pa.int64()),
            "n_terms": pa.array(nt, pa.int64()),
            "tf": pa.array(tf, pa.int64()),
            "doc_part": pa.array(ud % 16, pa.int64())})

    def and_match(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "total_tf": pa.array([], pa.int64())})
        ids = g.column("doc_id").to_numpy()
        ud, inv = np.unique(ids, return_inverse=True)
        nt = np.zeros(len(ud), np.int64)
        tf = np.zeros(len(ud), np.int64)
        np.add.at(nt, inv, g.column("n_terms").to_numpy())
        np.add.at(tf, inv, g.column("tf").to_numpy())
        keep = nt == n_terms
        return pa.table({"doc_id": pa.array(ud[keep], pa.int64()),
                         "total_tf": pa.array(tf[keep], pa.int64())})

    return (ray.data.read_parquet(paths,
                                  columns=["term", "doc_id", "tf"])
            .map_batches(filt, batch_format="pyarrow")
            .groupby("doc_part")
            .map_groups(and_match, batch_format="pyarrow")
            .select_columns(["doc_id", "total_tf"]))


def text_index_lookup(sf_dir: str,
                      terms: Sequence[str] = QUERY_TERMS
                      ) -> ray.data.Dataset:
    """End-to-end: build (cached per sf_dir) → pruned-partition lookup."""
    import hashlib
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    index_dir = f"/tmp/graft_text_index/{tag}-p{N_PARTS}"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        build_text_index(sf_dir, index_dir)
    return query_text_index(index_dir, terms)
