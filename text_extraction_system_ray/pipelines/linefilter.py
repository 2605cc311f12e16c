"""C4-style line-level page cleaning (Raffel et al. 2020, §2.2).

The C4 heuristics, frozen: keep a line only if it (a) ends in a
terminal punctuation mark, (b) has at least 3 words, and (c) does not
contain ``javascript``; drop the whole page if any line contains
``lorem ipsum`` or a ``{``.  The synthetic ``documents`` text is flat,
so the page's line structure is PLANTED deterministically from
``(doc_id, text)`` — the ``pii_redact`` pattern, mirrored line-for-line
in the SQL oracle: the body sentence plus rotating boilerplate lines
that exercise every rule (no-punctuation nav line, a javascript
notice, a too-short sentence, a valid extra sentence, and a
lorem-ipsum page killer).

Scale shape: a single ``map_batches`` stage — per-batch the planted
lines form one flat Arrow array, every rule is a vectorized
``pyarrow.compute`` kernel over it (``match_substring_regex`` /
``count_substring_regex`` / ``match_substring``), and per-doc stats
are ``np.bincount`` segment sums.  No shuffle, no driver pass; the op
is embarrassingly parallel at any corpus size.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _planted_lines(doc_id: int, text: Optional[str]) -> List[str]:
    """Frozen layout — keep in sync with the SQL oracle."""
    out = [(text or "") + "."]
    if doc_id % 5 == 0:
        out.append("click here for more")
    if doc_id % 6 == 3:
        out.append("please enable javascript to continue.")
    if doc_id % 7 == 1:
        out.append("ok then.")
    if doc_id % 2 == 0:
        out.append("this is a valid closing sentence number %d."
                   % (doc_id % 9))
    if doc_id % 31 == 5:
        out.append("lorem ipsum dolor sit amet.")
    return out


def _filter_batch(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    lines: List[str] = []
    counts = np.zeros(len(ids), np.int64)
    for j, (d, x) in enumerate(zip(ids, texts)):
        ls = _planted_lines(int(d), x)
        lines.extend(ls)
        counts[j] = len(ls)
    doc_ix = np.repeat(np.arange(len(ids)), counts)
    flat = pc.utf8_trim_whitespace(pa.array(lines, pa.string()))
    ends = pc.match_substring_regex(flat, r'[.!?"]$').to_numpy(
        zero_copy_only=False)
    nw = pc.count_substring_regex(flat, r"\S+").to_numpy()
    has_js = pc.match_substring(flat, "javascript").to_numpy(
        zero_copy_only=False)
    keep = ends & (nw >= 3) & ~has_js
    kill = (pc.match_substring(flat, "lorem ipsum").to_numpy(
        zero_copy_only=False)
        | pc.match_substring(flat, "{").to_numpy(zero_copy_only=False))
    ln = pc.utf8_length(flat).to_numpy()
    n = len(ids)
    n_kept = np.bincount(doc_ix, weights=keep, minlength=n)
    kept_chars = np.bincount(doc_ix, weights=keep * ln, minlength=n)
    kept_tokens = np.bincount(doc_ix, weights=keep * nw, minlength=n)
    doc_kill = np.bincount(doc_ix, weights=kill, minlength=n) > 0
    live = ~doc_kill
    return pa.table({
        "doc_id": pa.array(ids[live], pa.int64()),
        "n_lines": pa.array(counts[live], pa.int64()),
        "n_kept": pa.array(n_kept[live].astype(np.int64)),
        "kept_chars": pa.array(kept_chars[live].astype(np.int64)),
        "kept_tokens": pa.array(kept_tokens[live].astype(np.int64))})


def c4_line_filter(sf_dir: str) -> ray.data.Dataset:
    """Per-surviving-doc line-filter stats under the frozen C4 rules."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(_filter_batch,
                          batch_format="pyarrow").sort("doc_id")
