"""The flagship extraction pipeline (SURVEY.md §7.1 minimum slice, grown).

``extract_dataset``: read → extract (actor pool) → EXTRACTED_SCHEMA rows.
Linear and shuffle-free (SURVEY.md §4.2 "none for the happy path"); the
extract actors handle oversized PDFs in-process with bounded memory.

``extract_dataset_exploded``: the explicit cross-task skew path — page
explode → extract → ``groupby(url)`` fan-in. One hash shuffle on ``url``.
Property: identical output to ``extract_dataset`` (tests/test_chunk.py),
mirroring the reference's split/chord equivalence (``tasks.py:259-293``).
"""
from __future__ import annotations

import functools
from typing import Optional

import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.chunk import SplitGiantRows, merge_group
from ..stages.extract_stage import ExtractText


def _pool(concurrency) -> tuple:
    """int → safe autoscaling (1, n); tuple → fixed pool as given.
    A fixed pool saturates immediately (autoscaling ramps slowly), but the
    caller must size it below the cluster CPU count or the pool starves
    the read/write task operators — bench.py passes tuned fixed tuples,
    library defaults stay autoscaling."""
    if isinstance(concurrency, tuple):
        return concurrency
    return (1, concurrency)


def extract_dataset(ds: ray.data.Dataset,
                    cfg: Optional[PipelineConfig] = None,
                    concurrency=None) -> ray.data.Dataset:
    """pages rows → extracted rows. The happy path: zero shuffles."""
    cfg = cfg or DEFAULT_CONFIG
    return ds.map_batches(
        ExtractText,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=_pool(concurrency or cfg.extract_concurrency),
        num_cpus=1,
    )


def extract_dataset_exploded(ds: ray.data.Dataset,
                             cfg: Optional[PipelineConfig] = None,
                             concurrency: Optional[int] = None) -> ray.data.Dataset:
    """Explicit page-explode path for giant-PDF-heavy inputs.

    Every PDF row fans out to per-page chunk rows; groupby(url) is the
    single shuffle. Non-PDF rows ride along as 1-chunk groups, so the
    caller should pre-filter to the giant subset when mixing (the
    checkpointed job does; see state/checkpoint.py).
    """
    cfg = cfg or DEFAULT_CONFIG
    ds = ds.map_batches(
        SplitGiantRows,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=_pool(concurrency or cfg.extract_concurrency),
        num_cpus=1,
    )
    ds = ds.map_batches(
        ExtractText,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=_pool(concurrency or cfg.extract_concurrency),
        num_cpus=1,
    )
    return ds.groupby("url").map_groups(
        functools.partial(merge_group, cfg=cfg), batch_format="pyarrow")


def extract_document(payload: bytes, url: str = "doc",
                     lang_hint: str = "",
                     cfg: Optional[PipelineConfig] = None) -> dict:
    """Synchronous single-document convenience API (ref analog: the sync
    extraction endpoints, ``web_api.py:372-470`` — same pipeline, direct
    result). Returns the extract_row() dict."""
    from ..extract import extract_row
    return extract_row(url, payload, lang_hint, cfg or DEFAULT_CONFIG)


def extract_items(items, cfg: Optional[PipelineConfig] = None) -> ray.data.Dataset:
    """Small-batch convenience: list of {url, html, lang} dicts → extracted
    Dataset (ref analog: ``from_items`` path for sync endpoints,
    SURVEY.md §2.1 S3)."""
    return extract_dataset(ray.data.from_items(items), cfg)


def dedup_pages(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Optional exact url-dedup before extraction: hash-partition on url,
    first-wins (SURVEY.md §4.2(3) — an extension, not reference
    semantics; the reference keys everything by request_id)."""
    import pandas as pd

    def first(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.sort_values("url").head(1)

    return ds.groupby("url").map_groups(first, batch_format="pandas")
