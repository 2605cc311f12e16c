"""Exact-substring (window) deduplication statistics.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) remove any text span whose exact bytes occur elsewhere in the
corpus.  This operator computes the per-document *window* form of that
signal over word ``k``-grams: a window is a duplicate iff the identical
window text occurs at an earlier position in the global ``(doc_id,
pos)`` order (first occurrence wins, including repeats *within* one
document).  Output per document: total windows, duplicate windows and
the duplicate fraction — the quantity pipelines threshold on when
deciding to drop or trim a crawl document.

Scale shape (the reference has no dedup at all — SURVEY.md §2.5; this is
a training-data extension):

- stage 1 (``map_batches``, actor pool): tokenize, build window gram
  strings, md5-low64 each gram via DuckDB's vectorized C md5 kernel
  (same trick as ``textstats.FingerprintStage``; bit-identical to the
  SQL oracle's ``md5``).  Emits compact ``(h, key)`` int64
  rows — ``h`` is the hash's signed bit-view, ``key = doc_id <<
  POS_BITS | pos`` so one int64 carries the first-occurrence ordering —
  plus per-doc window-count partials.
  The text never leaves this stage.
- stage 2: ``groupby(h).aggregate(Min(key))`` — Ray pre-combines per
  block, so the all-to-all moves at most one 16-byte row per *distinct*
  window in each block.  This shuffle over the window stream is
  inherent to exact substring dedup (a distributed suffix array moves
  strictly more).
- stage 3: the winner rows map to ``(doc_id, n_first)`` partials;
  window-count partials, first-count partials and a zero seed per
  document (so empty docs still emit a row) union into ONE compact
  per-doc ``groupby(doc_id).sum`` — every input is pre-aggregated per
  batch, so the second shuffle moves O(#docs) tiny rows.

Duplicate detection compares md5-low64 values, not gram strings; a
collision would need ~2**32 distinct windows per corpus to become
likely and the oracle uses the identical hash, so engine and oracle
agree by construction.
"""
from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum

# pos fits 21 bits (2M windows/doc guard); doc_id keeps the top 42.
POS_BITS = 21
_POS_CAP = (1 << POS_BITS) - 1

WINDOW_WORDS = 5


class WindowHashes:
    """Actor stage: text → compact (window-hash, order-key) rows.

    Also emits per-doc window-count partials in a side column layout:
    output rows are a union of ``row_kind`` 0 (window: h, key) and 1
    (partial: h=doc_id, key=n_windows) so ONE stage feeds both the
    h-shuffle and the per-doc count without re-reading the text.
    """

    def __init__(self, k: int = WINDOW_WORDS):
        self.k = k
        try:
            import duckdb
            self._con = duckdb.connect()
        except Exception:                    # pragma: no cover - env gate
            self._con = None

    def _md5_low64(self, grams: List[str]) -> np.ndarray:
        if not grams:
            return np.empty(0, np.uint64)
        if self._con is not None:
            gt = pa.table({"g": pa.array(grams, pa.string())})
            self._con.register("gt", gt)
            try:
                out = self._con.execute(
                    "SELECT CAST(concat('0x', substr(md5(g), 1, 16)) "
                    "AS UBIGINT) AS h FROM gt").arrow()
            finally:
                self._con.unregister("gt")
            return out["h"].to_numpy().astype(np.uint64)
        import hashlib
        md5 = hashlib.md5
        return np.fromiter(
            (int.from_bytes(md5(g.encode("utf-8")).digest()[:8], "big")
             for g in grams), np.uint64, len(grams))

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        k = self.k
        grams: List[str] = []
        counts = np.empty(len(texts), np.int64)
        for di, x in enumerate(texts):
            toks = (x or "").lower().split()
            if not toks:
                counts[di] = 0
                continue
            if len(toks) < k:
                grams.append(" ".join(toks))
                counts[di] = 1
                continue
            n = len(toks) - k + 1
            if n > _POS_CAP:                 # pragma: no cover - guard
                raise ValueError("document exceeds 2M windows")
            grams.extend(" ".join(toks[i:i + k]) for i in range(n))
            counts[di] = n
        h = self._md5_low64(grams)
        # order keys: doc_id << POS_BITS | pos, vectorized per segment
        total = int(counts.sum())
        pos = np.arange(total, dtype=np.int64)
        ptr = np.zeros(len(texts) + 1, np.int64)
        np.cumsum(counts, out=ptr[1:])
        pos -= np.repeat(ptr[:-1], counts)
        key = (np.repeat(ids, counts) << POS_BITS) | pos
        kind = np.zeros(total + len(ids), np.int8)
        kind[total:] = 1
        # signed bit-view: md5-low64 values above 2**63 stay native
        # int64 through the groupby (uint64 would fall back to Ray's
        # pickled-object extension blocks mid-aggregate)
        h_signed = h.view(np.int64)
        return pa.table({
            "h": pa.array(np.concatenate(
                [h_signed, ids.astype(np.int64)]), pa.int64()),
            "key": pa.array(np.concatenate([key, counts]), pa.int64()),
            "row_kind": pa.array(kind, pa.int8())})


def _partials(t: pa.Table) -> pa.Table:
    """Aggregated (h, row_kind, min(key)) rows → per-doc partials.

    kind-0 rows are window-group winners: the doc owning ``min(key)``
    gets one first-occurrence credit (pre-combined per batch with
    ``np.unique``).  kind-1 rows carry a doc's total window count in
    ``min(key)`` (singleton groups — one per doc)."""
    kind = t.column("row_kind").to_numpy()
    keys = t.column("min(key)").to_numpy()
    win_docs, win_cnt = np.unique(keys[kind == 0] >> POS_BITS,
                                  return_counts=True)
    cnt_docs = t.column("h").to_numpy()[kind == 1].astype(np.int64)
    cnt_nw = keys[kind == 1]
    zw = np.zeros(len(win_docs), np.int64)
    zc = np.zeros(len(cnt_docs), np.int64)
    return pa.table({
        "doc_id": pa.array(np.concatenate([win_docs, cnt_docs]),
                           pa.int64()),
        "n_windows": pa.array(np.concatenate([zw, cnt_nw]), pa.int64()),
        "n_first": pa.array(np.concatenate([win_cnt, zc]), pa.int64())})


def _zero_seed(t: pa.Table) -> pa.Table:
    z = np.zeros(t.num_rows, np.int64)
    return pa.table({"doc_id": t.column("doc_id"),
                     "n_windows": pa.array(z, pa.int64()),
                     "n_first": pa.array(z, pa.int64())})


def _finalize(t: pa.Table) -> pa.Table:
    nw = t.column("sum(n_windows)").to_numpy()
    nf = t.column("sum(n_first)").to_numpy()
    dup = nw - nf
    frac = np.where(nw > 0, dup / np.maximum(nw, 1), 0.0)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_windows": pa.array(nw, pa.int64()),
        "n_dup_windows": pa.array(dup, pa.int64()),
        "dup_fraction": pa.array(frac, pa.float64())})


def substring_dup_stats(sf_dir: str, k: int = WINDOW_WORDS
                        ) -> ray.data.Dataset:
    """Per-doc exact-substring duplication signal (see module doc)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    rows = ds.map_batches(WindowHashes, fn_constructor_kwargs={"k": k},
                          batch_format="pyarrow", batch_size=256,
                          concurrency=(1, 8))
    # one shuffle; (h, row_kind) keying keeps window groups and per-doc
    # count rows from ever mixing (no reliance on hash/doc_id disjointness)
    partials = (rows.groupby(["h", "row_kind"]).aggregate(Min("key"))
                .map_batches(_partials, batch_format="pyarrow"))
    seed = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
            .map_batches(_zero_seed, batch_format="pyarrow"))
    return (partials.union(seed)
            .groupby("doc_id")
            .aggregate(Sum("n_windows"), Sum("n_first"))
            .map_batches(_finalize, batch_format="pyarrow"))
