"""Incremental snapshot dedup: which docs of a new crawl are novel?

Recurring crawls re-fetch mostly-unchanged content; curation pipelines
process only the delta.  This op compares two corpus snapshots at the
CONTENT level (md5 of the text, not doc identity — a page that moved to
a new id is still old content) and returns the new snapshot's novel
rows.  Snapshots are deterministic slices of ``documents``: the old
snapshot is ``doc_id % 3 != 2``, the new snapshot is everything, so
novelty means "no old doc anywhere had this exact text".

Scale shape (mirrors ``decontam.decontaminate``): the old side reduces
to distinct 8-byte content hashes — collected once, ``ray.put``
broadcast, probed per batch with a vectorized ``searchsorted`` while
the new snapshot streams with no shuffle.  Above the broadcast guard
the plan switches to a hash-partitioned native
``Dataset.join(left_outer)`` anti-join (marker-null filter); both paths
are pinned equal in ``tests/test_snapshot.py``.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

OLD_MOD = 3
OLD_EXCLUDE = 2  # old snapshot = doc_id % OLD_MOD != OLD_EXCLUDE

# distinct old-side hashes above this switch to the partitioned plan
BROADCAST_HASH_LIMIT = 16_000_000


def _text_hashes(texts: List[Optional[str]]
                 ) -> Tuple[np.ndarray, List[str]]:
    """(int64-view md5-low64, 16-hex-char digests) — one vectorized
    DuckDB md5 call (bit-identical to hashlib and the SQL oracle)."""
    try:
        import duckdb
        con = duckdb.connect()
        gt = pa.table({"g": pa.array([x or "" for x in texts],
                                     pa.string())})
        con.register("gt", gt)
        out = con.execute(
            "SELECT substr(md5(g), 1, 16) AS hex, "
            "CAST(concat('0x', substr(md5(g), 1, 16)) AS UBIGINT) AS h "
            "FROM gt").arrow()
        con.close()
        return (out["h"].to_numpy().astype(np.uint64).view(np.int64),
                out["hex"].to_pylist())
    except ImportError:                      # pragma: no cover - env gate
        import hashlib
        hexes = [hashlib.md5((x or "").encode("utf-8")).hexdigest()[:16]
                 for x in texts]
        return (np.array([int(h, 16) for h in hexes],
                         np.uint64).view(np.int64), hexes)


def _new_rows(t: pa.Table) -> pa.Table:
    h, hexes = _text_hashes(t.column("text").to_pylist())
    return pa.table({"doc_id": t.column("doc_id"),
                     "h": pa.array(h, pa.int64()),
                     "text_hash": pa.array(hexes, pa.string())})


def _old_uniques(t: pa.Table) -> pa.Table:
    """Compact rows → per-batch distinct OLD-side hashes."""
    ids = t.column("doc_id").to_numpy()
    h = t.column("h").to_numpy()
    return pa.table({"h": pa.array(
        np.unique(h[ids % OLD_MOD != OLD_EXCLUDE]), pa.int64())})


class _AntiProbe:
    def __init__(self, old_ref):
        self.old = ray.get(old_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy()
        if len(self.old):
            pos = np.minimum(np.searchsorted(self.old, h),
                             len(self.old) - 1)
            novel = self.old[pos] != h
        else:
            novel = np.ones(len(h), bool)
        return t.filter(pa.array(novel)).drop_columns(["h"])


def snapshot_delta(sf_dir: str, force_shuffle: bool = False
                   ) -> ray.data.Dataset:
    """Novel-content rows of the new snapshot: (doc_id, text_hash).

    The text is read and hashed EXACTLY ONCE: the compact
    ``(doc_id, h, text_hash)`` table (~32 B/doc) is materialized and
    both sides — the old snapshot's distinct hash set and the probed
    new rows — derive from it (branching the un-materialized pipeline
    would re-run the parquet read + md5 scan per consumer)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    rows = docs.map_batches(_new_rows,
                            batch_format="pyarrow").materialize()
    old_ds = rows.map_batches(_old_uniques, batch_format="pyarrow")
    # the guard count runs over the compact materialized table (sum of
    # per-batch distinct counts = a safe upper bound on the global
    # distinct count), NOT a second text scan
    if not force_shuffle and old_ds.count() <= BROADCAST_HASH_LIMIT:
        chunks = [b["h"].to_numpy(zero_copy_only=False)
                  for b in old_ds.iter_batches(batch_format="pyarrow")]
        old = np.unique(np.concatenate(chunks)) if chunks else \
            np.zeros(0, np.int64)
        ref = ray.put(old)
        return rows.map_batches(
            _AntiProbe, fn_constructor_kwargs={"old_ref": ref},
            batch_format="pyarrow", batch_size=4096,
            concurrency=(1, 8))
    # at-scale anti-join: distinct old hashes get a marker column; a
    # left-outer join leaves the marker null exactly on novel rows
    old_distinct = (old_ds.groupby("h").count()
                    .map_batches(
                        lambda t: pa.table({
                            "h": t["h"],
                            "old_marker": pa.array(
                                np.ones(t.num_rows, np.int64),
                                pa.int64())}),
                        batch_format="pyarrow"))
    new_ds = rows
    # 16 partitions: the repo-wide floor that stays deadlock-free on
    # small CPU counts (hash-shuffle aggregator actors need slots
    # alongside the map operators); scale runs raise it via the same
    # row-count rule as relational.lineitem_orders_join_native
    joined = new_ds.join(old_distinct, join_type="left_outer",
                         num_partitions=16, on=("h",))
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["old_marker"]))
                   .drop_columns(["h", "old_marker"]),
        batch_format="pyarrow")
