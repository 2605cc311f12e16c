"""Domain-mixture resampling: downsample over-represented domains so
the corpus approaches a target mixture (uniform across domains here —
the DoReMi/data-mixing building block: compute per-group acceptance
rates from observed vs target shares, then filter deterministically).

The synthetic corpus has uniform sources, so the domain label is
PLANTED with a skewed split (``doc_id % 10``: 0–5 → web 60 %, 6–8 →
books 30 %, 9 → wiki 10 % — the pii_redact planting pattern, mirrored
in the SQL oracle), making the resampling rule actually bite.

Two passes, both cheap:

1. per-domain doc counts — a tiny ``groupby`` over compact rows.  The
   driver turns shares into acceptance rates ``rate_d = min(1,
   target_share / observed_share)`` quantized to basis points and
   broadcasts the small ``domain → rate`` map.
2. a shuffle-free filter: keep a doc iff ``md5(doc_id) % 10000 <
   rate_bp(domain)`` — the same deterministic md5 acceptance test the
   ``stratified_sample`` op uses: reproducible, resumable, no RNG.

The SQL oracle recomputes counts, rates and the md5 test from scratch.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .shardshuffle import _keys

_DOMAINS = np.array(["web", "web", "web", "web", "web", "web",
                     "books", "books", "books", "wiki"])


def _domain_of(ids: np.ndarray) -> np.ndarray:
    return _DOMAINS[ids % 10]


def _rates_bp(counts: pd.DataFrame) -> dict:
    """domain → acceptance rate in basis points (uniform target)."""
    n_total = int(counts["n"].sum())
    target = n_total / len(counts)
    rates = np.minimum(1.0, target / counts["n"].to_numpy())
    return dict(zip(counts["domain"],
                    np.floor(rates * 10000).astype(np.int64)))


class _AcceptFilter:
    def __init__(self, rates_ref):
        self.rates = ray.get(rates_ref) if not isinstance(
            rates_ref, dict) else rates_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        dom = _domain_of(ids)
        bp = (_keys(ids) % np.uint64(10000)).astype(np.int64)
        rate = np.fromiter((self.rates[d] for d in dom),
                           np.int64, len(dom))
        keep = bp < rate
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "domain": pa.array(dom[keep], pa.string()),
            "accept_bp": pa.array(bp[keep], pa.int64())})


def mixture_sample(sf_dir: str) -> ray.data.Dataset:
    """Docs kept under the uniform-target mixture resampling rule:
    (doc_id, domain, accept_bp) for every retained row."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    counts = (ds.map_batches(
        lambda t: pa.table({"domain": pa.array(
            _domain_of(t.column("doc_id").to_numpy()), pa.string())}),
        batch_format="pyarrow")
        .groupby("domain").count().to_pandas()
        .rename(columns={"count()": "n"}))
    rates_ref = ray.put(_rates_bp(counts))
    return (ds.map_batches(
        _AcceptFilter, fn_constructor_kwargs={"rates_ref": rates_ref},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))
        .sort("doc_id"))
