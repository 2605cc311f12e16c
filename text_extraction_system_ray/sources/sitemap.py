"""Sitemap protocol source (sitemaps.org XML, from scratch).

The discovery side of a crawl: a site publishes ``sitemap.xml`` (or a
gzipped sitemap index pointing at per-section sitemaps) listing URLs
with ``lastmod`` stamps; the frontier seeds from it and recrawl
scheduling keys off lastmod. This module builds and parses the
protocol's two document kinds with a from-scratch scan (no XML lib —
the element grammar here is flat):

  <urlset><url><loc>…</loc><lastmod>YYYY-MM-DD</lastmod></url>…</urlset>
  <sitemapindex><sitemap><loc>…</loc></sitemap>…</sitemapindex>

Fixture: one gzipped sitemap per source listing that source's document
URLs, ``lastmod = 2021-01-01 + (doc_id % 365) days``, plus one index
document referencing them — all doc_id arithmetic for the oracle.
"""
from __future__ import annotations

import datetime as _dt
import re
import zlib
from typing import List, Tuple

import pyarrow as pa
import ray.data

_EPOCH = _dt.date(2021, 1, 1)

_LOC_RE = re.compile(rb"<loc>\s*(.*?)\s*</loc>", re.DOTALL)
_URL_BLOCK_RE = re.compile(rb"<url>(.*?)</url>", re.DOTALL)
_SM_BLOCK_RE = re.compile(rb"<sitemap>(.*?)</sitemap>", re.DOTALL)
_LASTMOD_RE = re.compile(rb"<lastmod>\s*(\d{4})-(\d{2})-(\d{2})\s*</lastmod>")


# one shared deterministic-gzip implementation (mtime=0 contract lives
# with its docs in warc.py)
from .warc import _gzip_member as _gz  # noqa: E402


def _gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return zlib.decompress(data, 47)
    return data


def build_sitemap(source: str, doc_ids: List[int]) -> bytes:
    """Gzipped urlset for one source."""
    rows = []
    for d in sorted(doc_ids):
        lastmod = _EPOCH + _dt.timedelta(days=d % 365)
        rows.append(
            f"<url><loc>https://example.org/{source}/{d:08d}</loc>"
            f"<lastmod>{lastmod.isoformat()}</lastmod></url>")
    xml = ('<?xml version="1.0" encoding="UTF-8"?>'
           '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           + "".join(rows) + "</urlset>")
    return _gz(xml.encode("utf-8"))


def build_sitemap_index(sources: List[str]) -> bytes:
    rows = [f"<sitemap><loc>https://example.org/sitemap-{s}.xml.gz</loc>"
            f"</sitemap>" for s in sorted(sources)]
    xml = ('<?xml version="1.0" encoding="UTF-8"?>'
           '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           + "".join(rows) + "</sitemapindex>")
    return xml.encode("utf-8")


def parse_sitemap(data: bytes) -> List[Tuple[str, _dt.date | None]]:
    """urlset bytes (gz or plain) → [(loc, lastmod|None)]."""
    data = _gunzip(data)
    out: List[Tuple[str, _dt.date | None]] = []
    for block in _URL_BLOCK_RE.finditer(data):
        b = block.group(1)
        loc = _LOC_RE.search(b)
        if loc is None:
            continue
        lm = _LASTMOD_RE.search(b)
        date = (_dt.date(int(lm.group(1)), int(lm.group(2)), int(lm.group(3)))
                if lm else None)
        out.append((loc.group(1).decode("utf-8"), date))
    return out


def parse_sitemap_index(data: bytes) -> List[str]:
    data = _gunzip(data)
    return [m.group(1).decode("utf-8")
            for b in _SM_BLOCK_RE.finditer(data)
            if (m := _LOC_RE.search(b.group(1)))]


def sitemap_census(sf_dir: str) -> ray.data.Dataset:
    """Per-source sitemap build + parse → census:
    (source, n_urls, min/max lastmod-day).

    Each batch builds REAL protocol bytes for the sources it sees and
    parses them back, so a source split across batches produces partial
    sitemaps whose censuses reconcile in the final Sum/Min/Max
    aggregate — the result reflects what the PARSER read, not the
    input ids. (The sitemap-index build/walk helpers are exercised in
    tests/test_sitemap.py.)"""
    import numpy as np

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def per_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        srcs = t.column("source").to_numpy(zero_copy_only=False)
        out_src, out_n, out_min, out_max = [], [], [], []
        for s in np.unique(srcs):
            m = srcs == s
            # build REAL protocol bytes and parse them back — the census
            # reflects what the parser read, not the input ids
            blob = build_sitemap(str(s), ids[m].tolist())
            entries = parse_sitemap(blob)
            days = np.array([(lm - _EPOCH).days for _, lm in entries
                             if lm is not None], np.int64)
            out_src.append(str(s))
            out_n.append(len(entries))
            out_min.append(int(days.min()))
            out_max.append(int(days.max()))
        return pa.table({"source": pa.array(out_src, pa.string()),
                         "p_n": pa.array(out_n, pa.int64()),
                         "p_min": pa.array(out_min, pa.int64()),
                         "p_max": pa.array(out_max, pa.int64())})

    rows = ds.map_batches(per_batch, batch_format="pyarrow")
    agg = rows.groupby("source").aggregate(
        ray.data.aggregate.Sum("p_n"),
        ray.data.aggregate.Min("p_min"),
        ray.data.aggregate.Max("p_max"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "n_urls": t.column("sum(p_n)").cast(pa.int64()),
            "min_lastmod_day": t.column("min(p_min)").cast(pa.int64()),
            "max_lastmod_day": t.column("max(p_max)").cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")
