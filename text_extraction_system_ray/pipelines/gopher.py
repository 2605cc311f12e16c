"""Gopher document-quality rules (Rae et al. 2021 §A1.1, public paper)
— the document-level companion to ``linefilter`` (C4 line rules) and
``textstats.repetition_signals`` (repetition rules).

Every threshold is INTEGERIZED so the verdict is exact and the DuckDB
oracle reproduces it bit-for-bit with no float-boundary risk:

  - 50 ≤ n_words ≤ 100 000
  - mean word length in [3, 10]  ⟺  3·n ≤ Σ|w| ≤ 10·n
  - ≥ 80 % words alphabetic      ⟺  5·n_alpha ≥ 4·n
  - ≥ 2 distinct stopwords from the 8-word Gopher list
  - symbol-to-word ratio ≤ 0.1   ⟺  10·n_sym ≤ n   (# anywhere or a
    trailing '...' — the paper's hash/ellipsis rule)

Shuffle-free: one vectorized ``map_batches`` pass, no aggregation.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .textstats import _batch_tokens, _segment_sums

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")
MIN_WORDS, MAX_WORDS = 50, 100_000


def gopher_filter(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    stops = list(GOPHER_STOPWORDS)

    def fn(t: pa.Table) -> pa.Table:
        texts = [(x or "").lower() for x in t.column("text").to_pylist()]
        flat, ptr = _batch_tokens(texts)
        n = (ptr[1:] - ptr[:-1]).astype(np.int64)
        if len(flat):
            idx = pd.Index(flat)
            wlen = np.fromiter((len(w) for w in flat), np.int64,
                               len(flat))
            has_alpha = np.fromiter(
                (any("a" <= ch <= "z" for ch in w) for w in flat),
                np.int64, len(flat))
            is_sym = np.fromiter(
                (1 if ("#" in w or w.endswith("...")) else 0
                 for w in flat), np.int64, len(flat))
            sum_chars = _segment_sums(wlen, ptr)
            n_alpha = _segment_sums(has_alpha, ptr)
            n_sym = _segment_sums(is_sym, ptr)
            stop_hits = np.zeros(len(texts), np.int64)
            for s in stops:
                hit = (idx == s).astype(np.int64)
                stop_hits += np.minimum(_segment_sums(hit, ptr), 1)
        else:
            sum_chars = n_alpha = n_sym = stop_hits = \
                np.zeros(len(texts), np.int64)
        keep = ((n >= MIN_WORDS) & (n <= MAX_WORDS)
                & (3 * n <= sum_chars) & (sum_chars <= 10 * n)
                & (5 * n_alpha >= 4 * n)
                & (stop_hits >= 2)
                & (10 * n_sym <= n))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(n, pa.int64()),
            "sum_word_chars": pa.array(sum_chars.astype(np.int64),
                                       pa.int64()),
            "n_alpha_words": pa.array(n_alpha.astype(np.int64),
                                      pa.int64()),
            "n_stop_distinct": pa.array(stop_hits, pa.int64()),
            "n_symbol_words": pa.array(n_sym.astype(np.int64),
                                       pa.int64()),
            "keep": pa.array(keep),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
