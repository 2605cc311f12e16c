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
- stage 2: hash-partition by ``h`` into ~``P`` coarse partitions
  (``P`` sized from the input file bytes so one partition ≈ 64 MB of
  window rows) and resolve ALL first-occurrence winners of a partition
  in ONE vectorized ``map_groups`` call — lexsort by ``(h, key)``, run
  boundaries by diff, per-doc credit via ``np.unique`` — never one
  Python group per distinct window (Ray's ``aggregate(Min)`` pays ~1 µs
  of per-group Python for each of the millions of distinct windows; the
  partition-batch kernel is ~40× faster at sf0.1 and the gap grows with
  corpus size).  The shuffle itself moves one 17-byte row per window —
  inherent to exact substring dedup (a distributed suffix array moves
  strictly more).
- stage 3: each partition emits per-doc ``(n_windows, n_first)``
  partials (pre-summed within the partition; every doc — even
  zero-window ones — is covered because stage 1 emits a count row per
  doc) into a second, small partition-batched sum keyed by ``doc_id``
  — the all-to-all moves O(#docs × P2) tiny rows.

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

    def __init__(self, k: int = WINDOW_WORDS, n_parts: int = 64):
        self.k = k
        self.n_parts = n_parts
        # lazy: instances ship to task workers (task-based map — no
        # actor-pool spin-up for a stateless stage); the connection is
        # built on first use in each worker process
        self._con = False

    def _md5_low64(self, grams: List[str]) -> np.ndarray:
        if self._con is False:
            try:
                import duckdb
                self._con = duckdb.connect()
            except Exception:                # pragma: no cover - env gate
                self._con = None
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
        # int64 through the shuffle (uint64 would fall back to Ray's
        # pickled-object extension blocks mid-aggregate)
        h_signed = h.view(np.int64)
        # co-locate all rows of an h in one partition; count rows (kind
        # 1) just need to reach *a* partition, keyed by doc for balance
        part = np.concatenate([
            (h & np.uint64(0x7FFFFFFF)).astype(np.int64) % self.n_parts,
            ids.astype(np.int64) % self.n_parts])
        return pa.table({
            "h": pa.array(np.concatenate(
                [h_signed, ids.astype(np.int64)]), pa.int64()),
            "key": pa.array(np.concatenate([key, counts]), pa.int64()),
            "row_kind": pa.array(kind, pa.int8()),
            "part": pa.array(part, pa.int64())})


def _resolve_partition(t: pa.Table) -> pa.Table:
    """One h-partition → per-doc (n_windows, n_first) partials.

    kind-0 rows: lexsort by (h, key); the first row of every h-run is
    the global first occurrence (all rows of an ``h`` share a
    partition), its doc gets one first-occurrence credit.  kind-1 rows
    carry a doc's total window count in ``key``.  Both are pre-summed
    per doc before leaving the task."""
    kind = t.column("row_kind").to_numpy()
    h = t.column("h").to_numpy()
    key = t.column("key").to_numpy()
    m0 = kind == 0
    h0, k0 = h[m0], key[m0]
    order = np.lexsort((k0, h0))
    h0s, k0s = h0[order], k0[order]
    starts = np.empty(len(h0s), bool)
    if len(h0s):
        starts[0] = True
        np.not_equal(h0s[1:], h0s[:-1], out=starts[1:])
    win_docs = k0s[starts] >> POS_BITS
    m1 = ~m0
    docs = np.concatenate([win_docs, h[m1]])
    nw = np.concatenate([np.zeros(len(win_docs), np.int64), key[m1]])
    nf = np.concatenate([np.ones(len(win_docs), np.int64),
                         np.zeros(int(m1.sum()), np.int64)])
    ud, inv = np.unique(docs, return_inverse=True)
    nw_s = np.zeros(len(ud), np.int64)
    nf_s = np.zeros(len(ud), np.int64)
    np.add.at(nw_s, inv, nw)
    np.add.at(nf_s, inv, nf)
    return pa.table({
        "doc_id": pa.array(ud, pa.int64()),
        "n_windows": pa.array(nw_s, pa.int64()),
        "n_first": pa.array(nf_s, pa.int64())})


def _sum_docs(t: pa.Table) -> pa.Table:
    """One doc-partition of partials → final per-doc stats rows."""
    docs = t.column("doc_id").to_numpy()
    ud, inv = np.unique(docs, return_inverse=True)
    nw = np.zeros(len(ud), np.int64)
    nf = np.zeros(len(ud), np.int64)
    np.add.at(nw, inv, t.column("n_windows").to_numpy())
    np.add.at(nf, inv, t.column("n_first").to_numpy())
    dup = nw - nf
    frac = np.where(nw > 0, dup / np.maximum(nw, 1), 0.0)
    return pa.table({
        "doc_id": pa.array(ud, pa.int64()),
        "n_windows": pa.array(nw, pa.int64()),
        "n_dup_windows": pa.array(dup, pa.int64()),
        "dup_fraction": pa.array(frac, pa.float64())})


def _n_parts_for(sz: int, per_part: int = 16 << 20) -> int:
    """Partition count from the on-disk documents size (compressed
    parquet bytes ≈ same order as the 17 B/window row stream), so one
    partition's window rows stay well under a task's heap."""
    return int(min(4096, max(16, sz // per_part)))


# below this on-disk size the compact window rows (~17 B each, an order
# of magnitude smaller than the text) come back to the driver and
# resolve in one numpy pass — the Ray shuffle's fixed task overhead
# dwarfs the actual work at small scale (same adaptive pattern, with the
# same honest shuffle fallback, as dedup.DRIVER_GROUP_DOC_LIMIT)
DRIVER_BYTES_LIMIT = 64 << 20


def substring_dup_stats(sf_dir: str, k: int = WINDOW_WORDS
                        ) -> ray.data.Dataset:
    """Per-doc exact-substring duplication signal (see module doc)."""
    import os
    try:
        sz = os.path.getsize(f"{sf_dir}/documents.parquet")
    except OSError:
        sz = DRIVER_BYTES_LIMIT + 1
    n_parts = _n_parts_for(sz)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    rows = ds.map_batches(WindowHashes(k=k, n_parts=n_parts),
                          batch_format="pyarrow", batch_size=512)
    # NB: every doc — even zero-window ones — has a kind-1 count row,
    # so no separate seed pass is needed on either path
    if sz <= DRIVER_BYTES_LIMIT:
        return _driver_finish(rows)
    # at-scale path — shuffle 1: co-locate by h-partition, resolve
    # winners vectorized per partition
    partials = (rows.groupby("part")
                .map_groups(_resolve_partition, batch_format="pyarrow"))
    # shuffle 2 (small): per-doc sum, again partition-batched — 16
    # doc-partitions resolve every doc in a handful of vectorized calls
    keyed = partials.map_batches(
        lambda t: t.append_column(
            "doc_part", pa.array(t.column("doc_id").to_numpy() % 16,
                                 pa.int64())),
        batch_format="pyarrow")
    return (keyed.groupby("doc_part")
            .map_groups(_sum_docs, batch_format="pyarrow")
            .select_columns(["doc_id", "n_windows", "n_dup_windows",
                             "dup_fraction"]))


def _driver_finish(rows: ray.data.Dataset) -> "pa.Table":
    """Small-corpus finish: concat the compact rows, run the same two
    vectorized kernels once on the driver (no shuffles)."""
    blocks = [b for b in ray.get(rows.to_arrow_refs()) if b.num_rows]
    t = pa.concat_tables(blocks, promote_options="none")
    out = _sum_docs(_resolve_partition(t))
    return out.select(["doc_id", "n_windows", "n_dup_windows",
                       "dup_fraction"])
