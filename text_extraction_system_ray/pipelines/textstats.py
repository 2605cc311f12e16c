"""Text-analysis operators over the ``documents`` table: token counting,
document statistics, quality scoring, language ID, fingerprinting.

These are the large-scale training-data-pipeline ops (graft brief): each
is a vectorized-per-batch ``map_batches`` stage; the language-ID stage is
an actor pool holding the compiled profiles (M24 analog of the reference's
FastText singleton, ``data_extract/lang.py:13-37``).

SQL-checkable ops (token_count, doc_stats, quality_score) compute exactly
what the DuckDB oracle in ``__ray_entry__`` computes; lang_id and
fingerprint are model-style ops with rows-only checks.
"""
from __future__ import annotations

import re
import zlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.lang import detect_language
from .util import round_scalar

_WS_SPLIT = re.compile(r"\s+")

# frozen stopword list shared with the SQL oracle (keep in sync with
# __ray_entry__._SQL_STOPWORDS)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def _tokens(text: str) -> List[str]:
    t = text.strip()
    return _WS_SPLIT.split(t) if t else []


def token_count(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n = [len(_tokens(x)) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_stats(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n_chars, n_tokens, avg_tok = [], [], []
        for x in texts:
            toks = _tokens(x)
            n_chars.append(len(x))
            n_tokens.append(len(toks))
            total = sum(len(w) for w in toks)
            avg_tok.append(round_scalar(total / len(toks), 4) if toks else 0.0)
        return pa.table({"doc_id": t["doc_id"],
                         "n_chars": pa.array(n_chars, pa.int64()),
                         "n_tokens": pa.array(n_tokens, pa.int64()),
                         "avg_token_len": pa.array(avg_tok, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """Frozen formula (mirrors the SQL oracle exactly):
    stop_ratio = stopword_tokens / tokens;
    len_score  = min(1, n_tokens / 50);
    score      = round(0.5 * len_score + 0.5 * stop_ratio, 4).
    (Real quality classifiers weight stopword presence positively for
    natural-language detection — C4/Gopher-style heuristics.)"""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    stop = frozenset(STOPWORDS)

    def fn(t: pa.Table) -> pa.Table:
        out_stop, out_len, out_score = [], [], []
        for x in t.column("text").to_pylist():
            toks = [w.lower() for w in _tokens(x)]
            n = len(toks)
            sr = (sum(1 for w in toks if w in stop) / n) if n else 0.0
            ls = min(1.0, n / 50.0)
            out_stop.append(round_scalar(sr, 4))
            out_len.append(round_scalar(ls, 4))
            out_score.append(round_scalar(0.5 * round_scalar(ls, 4) + 0.5 * round_scalar(sr, 4), 4))
        return pa.table({"doc_id": t["doc_id"],
                         "stop_ratio": pa.array(out_stop, pa.float64()),
                         "len_score": pa.array(out_len, pa.float64()),
                         "quality": pa.array(out_score, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Stateful language-ID stage (actor pool): profiles compiled once per
    actor in __init__ (M24 analog)."""

    def __init__(self):
        from ..functions import lang as _lang
        self._detect = _lang.detect_language

    def __call__(self, t: pa.Table) -> pa.Table:
        det = [self._detect(x or "") for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "lang_hint": t["lang"],
                         "detected_lang": pa.array(det, pa.string())})


def lang_id(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))


def fingerprint(sf_dir: str, k: int = 8, n_keep: int = 4) -> ray.data.Dataset:
    """Winnowing-style document fingerprint: CRC32 rolling window over
    k-grams of tokens; keep the n smallest hashes; fingerprint = CRC32 of
    their concatenation. Deterministic, order-insensitive to whitespace."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps, nsh = [], []
        for x in t.column("text").to_pylist():
            toks = _tokens((x or "").lower())
            grams = [" ".join(toks[i:i + k]) for i in range(max(1, len(toks) - k + 1))]
            hashes = sorted(zlib.crc32(g.encode("utf-8")) for g in grams)
            keep = hashes[:n_keep]
            fp = zlib.crc32(",".join(str(h) for h in keep).encode("ascii"))
            fps.append(fp)
            nsh.append(len(grams))
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(fps, pa.int64()),
                         "n_shingles": pa.array(nsh, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")
