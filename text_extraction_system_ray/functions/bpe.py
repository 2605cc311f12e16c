"""Byte-pair-encoding tokenizer: train + encode (Sennrich et al. 2016).

Real subword tokenization for the packing/token-count stages (the
whitespace tokenizer elsewhere is the oracle-parity baseline; this is
the trainable path).  Training is the classic algorithm: words become
char sequences with an end-of-word marker, and the most frequent
adjacent symbol pair merges each round (ties broken lexicographically,
so training is fully deterministic).

Scale shape: the corpus-wide word-frequency table is built with the
same per-batch combiner + driver merge the vocabulary op uses (word
vocab is Zipf-bounded; production tokenizers train on a bounded sample
anyway — pass ``max_docs``).  The merge loop itself is inherently
sequential driver work, run once offline.  Encoding broadcasts the
merge ranks via ``ray.put`` and streams batches through a per-unique-
word cache (Zipf again: most tokens are cache hits), no shuffle.

Not SQL-expressible (iterative merges), so exposed as a library API +
pytest goldens rather than a driver query.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

EOW = "</w>"


def _word_freqs_dataset(sf_dir: str, max_docs: Optional[int] = None
                        ) -> Dict[str, int]:
    """Corpus word-frequency table via per-batch combiners."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    if max_docs is not None:
        ds = ds.limit(max_docs)

    def partials(t: pa.Table) -> pa.Table:
        toks: List[str] = []
        for x in t.column("text").to_pylist():
            toks.extend((x or "").lower().split())
        if not toks:
            return pa.table({"w": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        uw, cnt = np.unique(np.asarray(toks, dtype=object).astype(str),
                            return_counts=True)
        return pa.table({"w": pa.array(uw, pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    freqs: Dict[str, int] = {}
    for b in ds.map_batches(partials,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow"):
        for w, c in zip(b["w"].to_pylist(), b["cnt"].to_pylist()):
            freqs[w] = freqs.get(w, 0) + int(c)
    return freqs


def train_bpe_from_freqs(freqs: Dict[str, int], n_merges: int
                         ) -> List[Tuple[str, str]]:
    """The classic merge loop; deterministic (count desc, pair asc)."""
    words: List[Tuple[Tuple[str, ...], int]] = [
        (tuple(w) + (EOW,), c) for w, c in sorted(freqs.items())]
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words = []
        for syms, c in words:
            out: List[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((tuple(out), c))
        words = new_words
    return merges


def train_bpe(sf_dir: str, n_merges: int = 200,
              max_docs: Optional[int] = None) -> List[Tuple[str, str]]:
    return train_bpe_from_freqs(_word_freqs_dataset(sf_dir, max_docs),
                                n_merges)


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]
                ) -> List[str]:
    """Apply merges to one word, lowest-rank (earliest-learned) first."""
    syms: List[str] = list(word) + [EOW]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncode:
    """Actor stage: per-doc BPE token counts with a unique-word cache."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref) if not isinstance(
            merges_ref, list) else merges_ref
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.cache: Dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        n_bpe = np.zeros(t.num_rows, np.int64)
        n_words = np.zeros(t.num_rows, np.int64)
        for i, x in enumerate(t.column("text").to_pylist()):
            ws = (x or "").lower().split()
            n_words[i] = len(ws)
            tot = 0
            for w in ws:
                c = self.cache.get(w)
                if c is None:
                    c = len(encode_word(w, self.ranks))
                    self.cache[w] = c
                tot += c
            n_bpe[i] = tot
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64())})


def bpe_token_counts(sf_dir: str, n_merges: int = 200,
                     max_docs: Optional[int] = None) -> ray.data.Dataset:
    """Train (bounded) → broadcast merges → count BPE tokens per doc."""
    merges = train_bpe(sf_dir, n_merges, max_docs)
    ref = ray.put(merges)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(BpeEncode,
                          fn_constructor_kwargs={"merges_ref": ref},
                          batch_format="pyarrow", batch_size=256,
                          concurrency=(1, 8))
