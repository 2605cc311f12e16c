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
    """Optional exact url-dedup before extraction: first-wins = the
    EARLIEST ``warc_ts`` crawl of each url (SURVEY.md §4.2(3) — an
    extension, not reference semantics; the reference keys everything by
    request_id).

    Physical plan (VERDICT r3 item 3): the old ``groupby(url).head(1)``
    spawned one pandas group per distinct url AND shuffled full page
    payloads; now only (url, warc_ts) pairs shuffle into a Min
    aggregate and the keep decision is a map-side broadcast filter
    (``dedup.first_wins_filter``) — page html never leaves its block.
    The input is scanned twice (winner pass + filter pass), which for a
    read-rooted dataset re-reads cheap column-pruned parquet instead of
    pinning the corpus in the object store."""
    from ray.data.aggregate import Min

    from ..pipelines.dedup import first_wins_filter

    import pyarrow as pa
    import pyarrow.compute as pc

    # project BEFORE the groupby — the aggregate's shuffle must move
    # (url, ts) pairs only, never the html payloads — and pre-cast the
    # timestamp to epoch-µs int64 (Ray's Min would round-trip it through
    # numpy at a coarser unit, truncating sub-second crawl times)
    def prj(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "url": t["url"],
            "__ts": pc.cast(t["warc_ts"].cast(pa.timestamp("us")),
                            pa.int64())})

    winners = ds.map_batches(prj, batch_format="pyarrow") \
        .groupby("url").aggregate(Min("__ts", alias_name="__keep"))
    return first_wins_filter(ds, winners, "url", "warc_ts",
                             id_type=pa.int64())
