"""Shared helpers for oracle-matched query results."""
from __future__ import annotations

import numpy as np


def round_half_up(x, nd: int):
    """Round half away from zero to ``nd`` decimals — DuckDB ROUND()
    semantics. numpy/pandas ``round`` is half-to-even, which diverges on
    exactly-representable halves (e.g. 1.125 @ 2dp); every rounded column
    the driver value-hashes must go through this helper."""
    scale = 10.0 ** nd
    a = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(a) * scale + 0.5) / scale, a)


def round_scalar(v: float, nd: int) -> float:
    return float(round_half_up(v, nd))


def scaled_int(x, nd: int) -> np.ndarray:
    """Round half-away to ``nd`` decimals and return the exact scaled
    integer (int64). Summing these is EXACT — the engine's analog of
    SQL ``SUM(CAST(... AS DECIMAL))``: float summation order varies
    between a distributed partial-sum tree and DuckDB's sequential sum,
    and a ~1e-6 divergence can flip a cent-level rounding boundary, so
    money/measure aggregates accumulate as integers and divide once at
    the end."""
    scale = 10.0 ** nd
    a = np.asarray(x, dtype=np.float64)
    return (np.copysign(np.floor(np.abs(a) * scale + 0.5), a)).astype(np.int64)


def join_partitions() -> int:
    """Hash-join/shuffle partition count derived from the cluster, not
    hardcoded: one partition per 2 cores, floor 4. Shared by every
    join-based plan (links, pagerank, ...) so a tuning change applies
    everywhere at once."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:                        # pragma: no cover - env gate
        cpus = 8
    return max(4, cpus // 2)
