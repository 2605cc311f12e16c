"""Semi-structured metadata extraction: JSON ``props`` → typed fields.

Web-scale pipelines constantly lift fields out of JSON sidecar columns
(WARC metadata, crawl headers, event payloads).  This op parses
``events.props`` with a real JSON parser and aggregates the extracted
value per event type — parse errors surface as a counted bucket rather
than a crash.

Scale shape: the parse runs inside ``map_batches`` (CPython's
C-accelerated ``json.loads`` per row — linear, no quadratic anywhere)
and the same batch immediately pre-aggregates to one partial row per
``event_type``, so the groupby shuffle moves O(#event_types × #blocks)
tiny rows, never the JSON strings.
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum


def _parse_partials(t: pa.Table) -> pa.Table:
    types = t.column("event_type").to_pylist()
    props = t.column("props").to_pylist()
    k = np.empty(len(props), np.int64)
    ok = np.ones(len(props), bool)
    loads = json.loads
    for i, p in enumerate(props):
        try:
            v = loads(p)["k"]
            k[i] = int(v)
        except (TypeError, ValueError, KeyError):
            k[i] = 0
            ok[i] = False
    tarr = np.asarray(types, dtype=object)
    ut, inv = np.unique(tarr, return_inverse=True)
    n = np.bincount(inv, minlength=len(ut)).astype(np.int64)
    bad = np.bincount(inv, weights=~ok, minlength=len(ut)).astype(np.int64)
    sum_k = np.bincount(inv, weights=np.where(ok, k, 0),
                        minlength=len(ut)).astype(np.int64)
    # min/max over valid rows only; sentinel when a type has none
    kmin = np.full(len(ut), np.iinfo(np.int64).max)
    kmax = np.full(len(ut), np.iinfo(np.int64).min)
    np.minimum.at(kmin, inv[ok], k[ok])
    np.maximum.at(kmax, inv[ok], k[ok])
    return pa.table({
        "event_type": pa.array(list(ut), pa.string()),
        "n_events": pa.array(n, pa.int64()),
        "n_invalid": pa.array(bad, pa.int64()),
        "sum_k": pa.array(sum_k, pa.int64()),
        "min_k": pa.array(kmin, pa.int64()),
        "max_k": pa.array(kmax, pa.int64())})


def _finalize(t: pa.Table) -> pa.Table:
    n = t.column("sum(n_events)").to_numpy()
    bad = t.column("sum(n_invalid)").to_numpy()
    s = t.column("sum(sum_k)").to_numpy()
    valid = n - bad
    return pa.table({
        "event_type": t.column("event_type"),
        "n_events": pa.array(n, pa.int64()),
        "n_invalid": pa.array(bad, pa.int64()),
        "sum_k": pa.array(s, pa.int64()),
        "min_k": t.column("min(min_k)"),
        "max_k": t.column("max(max_k)"),
        "avg_k": pa.array(np.where(valid > 0, s / np.maximum(valid, 1),
                                   0.0), pa.float64())})


def json_props_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type stats over the JSON-extracted ``k`` field."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])
    return (ds.map_batches(_parse_partials, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n_events"), Sum("n_invalid"), Sum("sum_k"),
                       Min("min_k"), Max("max_k"))
            .map_batches(_finalize, batch_format="pyarrow"))
