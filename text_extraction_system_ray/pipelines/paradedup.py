"""Paragraph-level exact deduplication across the corpus
(CCNet §4.1 / C4-style: boilerplate paragraphs — footers, nav blocks,
promos — repeat across millions of pages; keep only the first
occurrence of every distinct paragraph, corpus-wide).

The synthetic ``documents`` text is a flat word string, so the page's
paragraph structure is PLANTED deterministically from ``(doc_id,
text)`` — exactly the ``pii_redact`` planting pattern, mirrored in the
SQL oracle: an optional shared header (two rotating boilerplate
families), the doc's own body, and an optional rotating footer.  The
boilerplates are the cross-doc duplicates the op exists to remove.

Distributed shape (no driver pass, no per-pair Python):

1. one ``map_batches`` builds each doc's paragraph list and emits
   compact occurrence rows ``(h = md5-low64(para), occ = doc_id * 4 +
   idx, plen)`` plus per-doc ``n_paras`` partials — paragraph text
   never leaves the stage.
2. ``groupby(h).aggregate(Min(occ), Min(plen))`` — the single global
   shuffle, over 24-byte rows.  ``Min(occ)`` IS first-occurrence-wins
   (doc order then paragraph order); every row of a hash group carries
   identical text hence identical ``plen``, so ``Min(plen)`` is the
   winner's length.
3. winners decode to ``(doc_id, kept=1, kept_chars, checksum)`` rows;
   a second small ``groupby(doc_id)`` folds them with the ``n_paras``
   partials into per-doc keep stats.

Output per doc: ``n_paras``, ``n_kept``, ``kept_chars`` and an
order-insensitive ``kept_checksum`` (Σ h mod p over kept paragraphs) —
enough for the oracle to pin exactly WHICH occurrences won, not just
how many.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from .decontam import _md5_low64      # vectorized (DuckDB md5 kernel)

_CHECK_MOD = 1_000_000_007
_MAX_PARAS = 4          # occ stride; planted layout emits <= 3


def _planted_paragraphs(doc_id: int, text: Optional[str]) -> List[str]:
    """Frozen layout — keep in sync with the SQL oracle."""
    out: List[str] = []
    if doc_id % 3 == 0:
        out.append("shared footer all rights reserved")
    elif doc_id % 3 == 1:
        out.append("promo block %d" % (doc_id % 7))
    out.append(text or "")
    if doc_id % 4 == 2:
        out.append("contact page about %d" % (doc_id % 11))
    return out


def _occurrences(t: pa.Table) -> pa.Table:
    """Occurrence rows + per-doc n_paras partials (tagged occ = -1)."""
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    paras: List[str] = []
    occs: List[int] = []
    counts = np.zeros(len(ids), np.int64)
    for j, (d, x) in enumerate(zip(ids, texts)):
        ps = _planted_paragraphs(int(d), x)
        paras.extend(ps)
        occs.extend(int(d) * _MAX_PARAS + i for i in range(len(ps)))
        counts[j] = len(ps)
    occ = np.asarray(occs, np.int64)
    h = _md5_low64(paras).view(np.int64)
    plen = np.fromiter((len(p) for p in paras), np.int64, len(paras))
    return pa.table({
        "h": pa.array(np.concatenate([h, ids]), pa.int64()),
        "occ": pa.array(np.concatenate(
            [occ, np.full(len(ids), -1)]), pa.int64()),
        "plen": pa.array(np.concatenate([plen, counts]), pa.int64())})


def _fold_winners(t: pa.Table) -> pa.Table:
    """Winner rows → per-doc keep contributions."""
    occ = t.column("min(occ)").to_numpy()
    plen = t.column("min(plen)").to_numpy()
    h = t.column("h").to_numpy().astype(np.uint64)
    return pa.table({
        "doc_id": pa.array(occ // _MAX_PARAS, pa.int64()),
        "n_paras": pa.array(np.zeros(len(occ), np.int64)),
        "n_kept": pa.array(np.ones(len(occ), np.int64)),
        "kept_chars": pa.array(plen, pa.int64()),
        "kept_checksum": pa.array(
            (h % _CHECK_MOD).astype(np.int64), pa.int64())})


def _fold_partials(t: pa.Table) -> pa.Table:
    t = t.filter(pc.less(t["occ"], 0))
    z = np.zeros(t.num_rows, np.int64)
    return pa.table({
        "doc_id": t["h"],
        "n_paras": t["plen"],
        "n_kept": pa.array(z), "kept_chars": pa.array(z),
        "kept_checksum": pa.array(z)})


def _driver_finish(rows: "ray.data.Dataset") -> pa.Table:
    """Small-corpus finish: reduce the compact occurrence table on the
    driver in one vectorized pass (the ``exact_dedup`` adaptive
    pattern — an all-to-all over 24 B rows costs more than it moves)."""
    t = rows.to_pandas()
    real = t[t["occ"] >= 0]
    h = real["h"].to_numpy()
    occ = real["occ"].to_numpy()
    plen = real["plen"].to_numpy()
    order = np.lexsort((occ, h))
    hs, os_ = h[order], occ[order]
    winner_pos = np.ones(len(hs), bool)
    winner_pos[1:] = hs[1:] != hs[:-1]      # first occ per hash group
    kept = np.zeros(len(hs), bool)
    kept[order] = winner_pos
    doc = occ // _MAX_PARAS
    part = t[t["occ"] < 0]
    ids = part["h"].to_numpy()              # partials carry doc_id in h
    n_paras_arr = part["plen"].to_numpy()
    s = np.argsort(ids, kind="stable")      # block order isn't guaranteed
    ids, n_paras_arr = ids[s], n_paras_arr[s]
    idx = np.searchsorted(ids, doc)
    n_kept = np.bincount(idx, weights=kept, minlength=len(ids))
    kept_chars = np.bincount(idx, weights=kept * plen,
                             minlength=len(ids))
    chk = (h.astype(np.uint64) % _CHECK_MOD).astype(np.float64)
    kept_chk = np.bincount(idx, weights=kept * chk, minlength=len(ids))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_paras": pa.array(n_paras_arr, pa.int64()),
        "n_kept": pa.array(n_kept.astype(np.int64)),
        "kept_chars": pa.array(kept_chars.astype(np.int64)),
        "kept_checksum": pa.array(kept_chk.astype(np.int64))})


def paragraph_dedup(sf_dir: str):
    """Per-doc paragraph keep stats under corpus-wide first-wins."""
    from .dedup import DRIVER_GROUP_DOC_LIMIT, _n_docs
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    rows = ds.map_batches(_occurrences,
                          batch_format="pyarrow").materialize()
    if _n_docs(sf_dir) <= DRIVER_GROUP_DOC_LIMIT:
        out = _driver_finish(rows)
        return out.to_pandas().sort_values("doc_id").reset_index(
            drop=True)
    winners = (rows.map_batches(
        lambda t: t.filter(pc.greater_equal(t["occ"], 0)),
        batch_format="pyarrow")
        .groupby("h").aggregate(Min("occ"), Min("plen"))
        .map_batches(_fold_winners, batch_format="pyarrow"))
    partials = rows.map_batches(_fold_partials, batch_format="pyarrow")
    return (winners.union(partials)
            .groupby("doc_id")
            .aggregate(Sum("n_paras"), Sum("n_kept"),
                       Sum("kept_chars"), Sum("kept_checksum"))
            .map_batches(lambda t: pa.table({
                "doc_id": t["doc_id"],
                "n_paras": t["sum(n_paras)"],
                "n_kept": t["sum(n_kept)"],
                "kept_chars": t["sum(kept_chars)"],
                "kept_checksum": t["sum(kept_checksum)"]}),
                batch_format="pyarrow")
            .sort("doc_id"))
