"""Deterministic train/val/test corpus split manifest.

The standard last step before training: assign every document to a
split with a deterministic hash rule (no RNG, reproducible across
runs/scales/parallelism — the property the reference gets from its
request-id-keyed directory layout, ``file_storage/__init__.py``), then
report the per-(split, lang) manifest a training job consumes: doc
count, token count, char count.

Rule: ``md5_low64(doc_id) % 10000`` → <9000 train (90 %), <9500 val
(5 %), else test (5 %) — the same md5 acceptance idiom as
``stratified_sample`` / ``mixture_sample``, so the SQL oracle can
recompute the assignment bit-for-bit.

Scale shape: one streaming pass; each batch collapses to at most
|splits|×|langs| partial rows (np.unique combiner), so the ``groupby``
shuffles a few dozen rows per block regardless of corpus size. Token
counting is a single vectorized RE2 scan (``count_substring_regex``),
no per-row Python and no token materialization.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .shardshuffle import _keys

_NAMES = np.array(["train", "val", "test"])


def _split_of(ids: np.ndarray) -> np.ndarray:
    bp = (_keys(ids) % np.uint64(10000)).astype(np.int64)
    return np.where(bp < 9000, 0, np.where(bp < 9500, 1, 2))


def _partials(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_numpy()
    split = _split_of(ids)
    # token count = number of \S+ runs: one vectorized RE2 scan
    n_tok = pc.count_substring_regex(
        pc.cast(t["text"], pa.large_string()), r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
    n_chr = t.column("n_chars").to_numpy()
    lang_codes, lang_uniq = pd.factorize(
        t.column("lang").to_pandas(), sort=True)
    gkey = split * len(lang_uniq) + lang_codes
    ug, inv = np.unique(gkey, return_inverse=True)
    return pa.table({
        "split": pa.array(_NAMES[ug // len(lang_uniq)], pa.string()),
        "lang": pa.array(lang_uniq.to_numpy()[ug % len(lang_uniq)],
                         pa.string()),
        "n_docs": pa.array(np.bincount(inv), pa.int64()),
        "n_tokens": pa.array(np.bincount(inv, weights=n_tok).astype(
            np.int64), pa.int64()),
        "n_chars": pa.array(np.bincount(inv, weights=n_chr).astype(
            np.int64), pa.int64())})


def corpus_split(sf_dir: str) -> pd.DataFrame:
    """Per-(split, lang) manifest: n_docs / n_tokens / n_chars."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"])
    parts = (ds.map_batches(_partials, batch_format="pyarrow")
             .groupby(["split", "lang"])
             .sum(["n_docs", "n_tokens", "n_chars"]).to_pandas())
    parts = parts.rename(columns={"sum(n_docs)": "n_docs",
                                  "sum(n_tokens)": "n_tokens",
                                  "sum(n_chars)": "n_chars"})
    return parts.sort_values(["split", "lang"]).reset_index(drop=True)
