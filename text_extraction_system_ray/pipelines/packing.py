"""Training-sequence packing: GPT-style concat-and-chunk layout.

Pretraining prep concatenates every document's tokens (plus one EOS
separator) into one global stream in ``doc_id`` order and cuts it into
fixed-length sequences.  This operator computes, per document, where it
lands in that layout: its global token offset and the first/last
sequence index it touches — the metadata a sharded tokenizer needs to
write its piece of the packed output without seeing any other shard.

Distributed-scan shape (no global sort of the data, no driver pass over
rows):

1. token counts: one ``map_batches`` over ``documents`` using the
   vectorized ``pyarrow.compute.count_substring_regex(text, "\\S+")``
   kernel — the text never leaves this stage; it emits compact
   ``(doc_id, nt)`` rows AND per-bucket ``(bucket, total)`` partials,
   where ``bucket = doc_id // BUCKET``.
2. bucket totals: ``groupby(bucket).sum`` over the partials — a small
   aggregate (``n_docs / BUCKET`` rows; 1 B docs → 244 k rows) that the
   driver exclusive-prefix-sums into per-bucket start offsets and
   broadcasts via ``ray.put``.
3. within-bucket scan: ``groupby(bucket).map_groups`` — each group is at
   most ``BUCKET`` docs (bounded memory), sorted by ``doc_id`` and
   exclusive-cumsummed in one numpy pass, plus the broadcast bucket
   offset.

Semantics: doc ``d`` occupies stream slots ``[off, off + nt + 1)``
(tokens then EOS), ``off = Σ_{d' < d} (nt(d') + 1)``; ``seq_first =
off // L``, ``seq_last = (off + nt) // L`` (the EOS-inclusive extent, so
empty docs land in exactly one sequence with no special case).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

SEQ_LEN = 128
BUCKET = 4096


def _counts_and_partials(t: pa.Table, bucket_size: int) -> pa.Table:
    """text → (doc_id, nt) rows + per-bucket total partials.

    Partial rows are tagged ``doc_id = -1 - bucket`` (negative range is
    disjoint from real doc ids) so one output feeds both consumers."""
    ids = t.column("doc_id").to_numpy()
    nt = pc.count_substring_regex(
        pc.fill_null(t.column("text"), ""), r"\S+").to_numpy()
    bucket = ids // bucket_size
    ub, inv = np.unique(bucket, return_inverse=True)
    tot = np.zeros(len(ub), np.int64)
    np.add.at(tot, inv, nt + 1)
    return pa.table({
        "doc_id": pa.array(np.concatenate([ids, -1 - ub]), pa.int64()),
        "nt": pa.array(np.concatenate([nt, tot]), pa.int64()),
        "bucket": pa.array(np.concatenate([bucket, ub]), pa.int64())})


def _scan_group(g: pd.DataFrame, offsets, seq_len: int) -> pd.DataFrame:
    """One bucket: doc_id-sorted exclusive cumsum + bucket base offset."""
    g = g[g["doc_id"] >= 0].sort_values("doc_id")
    if len(g) == 0:
        return pd.DataFrame({"doc_id": [], "n_tokens": [],
                             "start_off": [], "seq_first": [],
                             "seq_last": []}).astype("int64")
    nt = g["nt"].to_numpy()
    base = offsets.get(int(g["bucket"].iloc[0]), 0)
    off = base + np.concatenate([[0], np.cumsum(nt + 1)[:-1]])
    return pd.DataFrame({
        "doc_id": g["doc_id"].to_numpy(),
        "n_tokens": nt,
        "start_off": off,
        "seq_first": off // seq_len,
        "seq_last": (off + nt) // seq_len})


def pack_sequences(sf_dir: str, seq_len: int = SEQ_LEN,
                   bucket_size: int = BUCKET) -> ray.data.Dataset:
    """Per-doc packed-layout metadata (see module doc)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        return _counts_and_partials(t, bucket_size)

    # materialize the COMPACT count rows (24 B/doc — never the text):
    # the bucket-totals aggregate must finish before the scan can start,
    # so the two consumers are serial anyway; without this the text
    # would be read and tokenized twice
    rows = ds.map_batches(counts, batch_format="pyarrow").materialize()
    # small aggregate: one row per bucket; driver prefix-sums and
    # broadcasts the per-bucket base offsets
    totals = (rows.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 0))
                   .select(["bucket", "nt"]),
        batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("nt")).to_pandas())
    totals = totals.sort_values("bucket")
    tot = totals["sum(nt)"].to_numpy()
    base = np.concatenate([[0], np.cumsum(tot)[:-1]])
    offsets_ref = ray.put(dict(zip(totals["bucket"].astype(int), base)))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        return _scan_group(g, ray.get(offsets_ref), seq_len)

    return (rows.groupby("bucket")
            .map_groups(scan, batch_format="pandas")
            .select_columns(["doc_id", "n_tokens", "start_off",
                             "seq_first", "seq_last"]))
