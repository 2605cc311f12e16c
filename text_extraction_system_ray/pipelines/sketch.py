"""Mergeable distinct-count sketch (HyperLogLog, Flajolet et al. 2007).

THE at-scale cardinality op: exact COUNT(DISTINCT) over 10^12 rows is
a full shuffle of every key; HLL reduces it to a 1024-cell register
that merges by elementwise max — each batch emits its bucket-max
partials (the combiner), one tiny groupby-max merges them, and the
driver finishes a 1024-row register. No text ever leaves the batch.

Exactness engineering (the whole sketch is ORACLE-REPRODUCIBLE):
  - hash = md5-low64 (the repo's oracle-parity hash; DuckDB recomputes
    it with ``CAST(concat('0x', substr(md5(x),1,16)) AS UBIGINT)``).
  - bucket = top 10 bits, w = low 54 bits, rho = min(55 - bitlen(w), 40)
    with bitlen computed by INTEGER binary reduction (never float log2 —
    exact up to the 2^53 double boundary is not good enough).
  - The register sum Σ 2^-M_j is carried as the exact int64 numerator
    ``Σ 2^(40 - M_j)`` over denominator 2^40 (capping rho at 40 keeps
    the worst case 1024·2^39 = 2^49 inside int64), so the raw-estimate
    division is a single IEEE op on identical operands in numpy and
    DuckDB. Small-range correction (linear counting) uses libm ln on
    identical operands; the output rounds to 4 decimals so a 1-ulp libm
    difference cannot flip the compare.
"""
from __future__ import annotations

import math
from typing import List

import numpy as np
import pyarrow as pa
import ray.data

from .decontam import _md5_low64

P = 10                    # register index bits
M = 1 << P                # 1024 buckets
W_BITS = 64 - P           # 54-bit remainder
RHO_CAP = 40              # keeps the exact numerator inside int64
ALPHA = 0.7213 / (1.0 + 1.079 / M)


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length (no float log2)."""
    w = w.copy()
    bl = np.zeros(len(w), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m_ = w >= (np.uint64(1) << np.uint64(s))
        bl[m_] += s
        w[m_] >>= np.uint64(s)
    bl += (w > 0)
    return bl


def register_partials(texts: List[str]) -> pa.Table:
    """One batch of values → (bucket, max rho) partial register rows."""
    h = _md5_low64([t or "" for t in texts])
    bucket = (h >> np.uint64(W_BITS)).astype(np.int64)
    w = (h & np.uint64((1 << W_BITS) - 1))
    rho = np.minimum(W_BITS + 1 - _bitlen_u64(w), RHO_CAP)
    mx = np.zeros(M, np.int64)
    np.maximum.at(mx, bucket, rho)
    nz = np.nonzero(mx)[0]
    return pa.table({"bucket": pa.array(nz, pa.int64()),
                     "max_rho": pa.array(mx[nz], pa.int64())})


def finish(buckets: np.ndarray, max_rho: np.ndarray) -> dict:
    """Merged register → estimate row (integer-exact numerator)."""
    reg = np.zeros(M, np.int64)
    np.maximum.at(reg, buckets, max_rho)
    zero_buckets = int((reg == 0).sum())
    numerator = int((np.int64(1) << (RHO_CAP - reg)).sum())
    raw = ALPHA * M * M * float(1 << RHO_CAP) / numerator
    if raw <= 2.5 * M and zero_buckets > 0:
        est = M * math.log(M / zero_buckets)
    else:
        est = raw
    return {"m": M, "zero_buckets": zero_buckets,
            "rho_numerator": numerator, "estimate": round(est, 4)}


def hll_distinct_text(sf_dir: str) -> pa.Table:
    """HLL distinct-text estimate over documents: one row
    (m, zero_buckets, rho_numerator, estimate)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    partials = ds.map_batches(
        lambda t: register_partials(t.column("text").to_pylist()),
        batch_format="pyarrow")
    merged = partials.groupby("bucket").max("max_rho")
    rows = merged.take_all()          # ≤ 1024 rows — the sketch itself
    row = finish(np.array([r["bucket"] for r in rows], np.int64),
                 np.array([r["max(max_rho)"] for r in rows], np.int64))
    return pa.table({k: pa.array([v]) for k, v in row.items()})
