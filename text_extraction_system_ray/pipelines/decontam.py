"""Benchmark decontamination over the ``documents`` table.

The standard training-data hygiene step (GPT-3 appx. C / PaLM §6.1
style): flag every training document that shares at least one word
``K``-gram with a held-out evaluation set, so contaminated rows can be
dropped before training.  Here the eval set is the deterministic
``doc_id % EVAL_MOD == EVAL_RESIDUE`` slice of the corpus (the synth
analog of a benchmark suite); everything else is the training side.

Scale shape: benchmark suites are megabytes while training corpora are
terabytes, so the eval n-gram set is the canonical broadcast small side
— it is collected once (distinct hashes only, 8 bytes each), shipped to
the object store with ``ray.put``, and every training batch probes it
with a vectorized ``searchsorted``; the corpus itself streams through
one ``map_batches`` with no shuffle.  When the eval side outgrows the
broadcast guard (``EVAL_BROADCAST_HASH_LIMIT``), the plan switches to a
hash-partitioned native ``Dataset.join`` semi-join — both paths produce
identical output (``tests/test_decontam.py`` pins this).

Gram identity is the md5-low64 of the space-joined lowercase gram, the
same oracle-parity hash the simhash/fingerprint ops use: DuckDB can
recompute it exactly, so the SQL oracle joins on gram *strings* while
the engine joins on 64-bit hashes (collision probability ~n²/2⁶⁵ —
negligible at any corpus size this guard admits).
"""
from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

# eval slice: doc_id % EVAL_MOD == EVAL_RESIDUE (~2.4 % of the corpus)
EVAL_MOD = 41
EVAL_RESIDUE = 7
K = 8  # word-gram width (the published decontamination range is 8-13)

# broadcast guard: distinct eval gram hashes above this switch the plan
# to the partitioned semi-join (16M hashes = 128 MB object)
EVAL_BROADCAST_HASH_LIMIT = 16_000_000


def _gram_hashes_batch(texts: List[Optional[str]],
                       k: int = K) -> Tuple[np.ndarray, np.ndarray]:
    """Per-doc word-``k``-gram md5-low64 hashes for a batch.

    Returns ``(flat uint64 hashes, ptr)`` with ``ptr`` of length
    ``len(texts)+1``.  Docs with fewer than ``k`` tokens contribute no
    grams.  Gram strings are built in one Python pass and hashed in ONE
    vectorized DuckDB ``md5`` call over an Arrow column (bit-identical
    to hashlib and to the SQL oracle; measured 3× faster than a
    per-gram hashlib loop — same trade as ``FingerprintStage``).
    """
    counts = np.empty(len(texts), np.int64)
    grams: List[str] = []
    for di, x in enumerate(texts):
        toks = (x or "").strip().lower().split()
        g = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        counts[di] = len(g)
        grams.extend(g)
    ptr = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(counts, out=ptr[1:])
    # int64 reinterpretation: Ray's hash-shuffle pickles uint64 columns
    # into extension objects, so every hash column repo-side is the
    # bit-identical int64 view (equality joins and searchsorted over a
    # consistently-viewed array are unaffected)
    return _md5_low64(grams).view(np.int64), ptr


def _md5_low64(grams: List[str]) -> np.ndarray:
    try:
        import duckdb
        if grams:
            con = duckdb.connect()
            gt = pa.table({"g": pa.array(grams, pa.string())})
            con.register("gt", gt)
            out = con.execute(
                "SELECT CAST(concat('0x', substr(md5(g), 1, 16)) "
                "AS UBIGINT) AS h FROM gt").arrow()
            con.close()
            return out["h"].to_numpy().astype(np.uint64)
    except ImportError:                      # pragma: no cover - env gate
        pass
    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(g.encode("utf-8")).digest()[:8], "big")
         for g in grams), np.uint64, len(grams))


def _read_docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _eval_hash_table(t: pa.Table) -> pa.Table:
    """Distinct gram hashes of the eval docs in one batch."""
    ids = t.column("doc_id").to_numpy()
    mask = ids % EVAL_MOD == EVAL_RESIDUE
    if not mask.any():
        return pa.table({"h": pa.array([], pa.int64())})
    texts = t.column("text").take(
        pa.array(np.flatnonzero(mask))).to_pylist()
    h, _ = _gram_hashes_batch(texts)
    return pa.table({"h": pa.array(np.unique(h), pa.int64())})


class _ProbeStage:
    """Training-side probe: per-doc distinct gram hashes searchsorted
    against the broadcast (sorted) eval hash array."""

    def __init__(self, eval_ref):
        self.eval_hashes = ray.get(eval_ref) if not isinstance(
            eval_ref, np.ndarray) else eval_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        mask = ids % EVAL_MOD != EVAL_RESIDUE
        keep = np.flatnonzero(mask)
        texts = t.column("text").take(pa.array(keep)).to_pylist()
        h, ptr = _gram_hashes_batch(texts)
        ev = self.eval_hashes
        n_shared = np.zeros(len(texts), np.int64)
        if len(h) and len(ev):
            # distinct within doc, then membership in the eval set
            order_key = np.repeat(np.arange(len(texts), dtype=np.int64),
                                  ptr[1:] - ptr[:-1])
            # unique (doc, hash) pairs via lexsort + diff
            srt = np.lexsort((h, order_key))
            dk, hk = order_key[srt], h[srt]
            first = np.ones(len(hk), bool)
            first[1:] = (dk[1:] != dk[:-1]) | (hk[1:] != hk[:-1])
            dk, hk = dk[first], hk[first]
            pos = np.searchsorted(ev, hk)
            pos_c = np.minimum(pos, len(ev) - 1)
            hit = ev[pos_c] == hk
            n_shared = np.bincount(dk[hit], minlength=len(texts))
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_shared": pa.array(n_shared.astype(np.int64), pa.int64()),
            "contaminated": pa.array((n_shared > 0).astype(np.int64),
                                     pa.int64())})


def _train_gram_pairs(t: pa.Table) -> pa.Table:
    """(doc_id, h) distinct pairs for training docs — the probe side of
    the partitioned semi-join plan."""
    ids = t.column("doc_id").to_numpy()
    mask = ids % EVAL_MOD != EVAL_RESIDUE
    keep = np.flatnonzero(mask)
    texts = t.column("text").take(pa.array(keep)).to_pylist()
    h, ptr = _gram_hashes_batch(texts)
    doc = np.repeat(ids[keep], ptr[1:] - ptr[:-1])
    if len(h):
        srt = np.lexsort((h, doc))
        d, hh = doc[srt], h[srt]
        first = np.ones(len(d), bool)
        first[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
        d, hh = d[first], hh[first]
    else:
        d, hh = doc[:0], h
    return pa.table({"doc_id": pa.array(d, pa.int64()),
                     "h": pa.array(hh, pa.int64())})


def _train_ids(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_numpy()
    return pa.table({"doc_id": pa.array(
        ids[ids % EVAL_MOD != EVAL_RESIDUE], pa.int64())})


def decontaminate(sf_dir: str, force_shuffle: bool = False):
    """Flag training docs sharing any word-``K``-gram with the eval
    slice.  Output: one row per training doc — ``(doc_id, n_shared,
    contaminated)`` with ``n_shared`` = count of distinct shared grams.

    Default plan: broadcast the distinct eval gram hashes (guarded);
    above the guard (or with ``force_shuffle``) a hash-partitioned
    native ``Dataset.join`` computes the same semi-join without any
    driver materialization of the eval side.
    """
    docs = _read_docs(sf_dir)
    eval_ds = docs.map_batches(_eval_hash_table, batch_format="pyarrow")
    n_eval = eval_ds.count()
    if not force_shuffle and n_eval <= EVAL_BROADCAST_HASH_LIMIT:
        # distinct-across-batches on the driver: batches are already
        # distinct-within-batch, so this union is tiny
        chunks = [b["h"].to_numpy(zero_copy_only=False)
                  for b in eval_ds.iter_batches(batch_format="pyarrow")]
        ev = np.unique(np.concatenate(chunks)) if chunks else \
            np.zeros(0, np.int64)
        ref = ray.put(ev)
        return docs.map_batches(
            _ProbeStage, fn_constructor_kwargs={"eval_ref": ref},
            batch_format="pyarrow", batch_size=256, concurrency=(1, 8))
    # at-scale plan: distinct eval hashes via groupby, then a
    # partitioned inner join against the (doc, h) pairs
    eval_distinct = eval_ds.groupby("h").count().drop_columns(["count()"])
    pairs = docs.map_batches(_train_gram_pairs, batch_format="pyarrow")
    joined = pairs.join(eval_distinct, join_type="inner",
                        num_partitions=16, on=("h",))
    hits = joined.groupby("doc_id").count()

    def _rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_shared": pa.compute.cast(t["count()"], pa.int64())})

    hits = hits.map_batches(_rename, batch_format="pyarrow")
    # clean docs re-enter via a zero row per training doc + groupby sum
    # (join-free: a left-outer here would re-shuffle the big side anyway)
    zeros = docs.map_batches(_train_ids, batch_format="pyarrow") \
        .map_batches(lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_shared": pa.array(np.zeros(len(t), np.int64), pa.int64())}),
            batch_format="pyarrow")
    from ray.data.aggregate import Sum
    summed = zeros.union(hits).groupby("doc_id").aggregate(
        Sum("n_shared", alias_name="n_shared"))

    def _final(t: pa.Table) -> pa.Table:
        ns = t.column("n_shared").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "doc_id": pa.compute.cast(t["doc_id"], pa.int64()),
            "n_shared": pa.array(ns, pa.int64()),
            "contaminated": pa.array((ns > 0).astype(np.int64),
                                     pa.int64())})

    return summed.map_batches(_final, batch_format="pyarrow")
