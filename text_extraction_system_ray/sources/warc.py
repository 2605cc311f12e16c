"""WARC container source/sink (ISO 28500 / WARC 1.0, from scratch).

Common-Crawl ships pages as WARC: one gzip *member* per record,
concatenated into .warc.gz shards. The input contract (BASELINE.json
``input_hint``) is the Parquet pages table; this module lets the same
pipeline ingest the upstream container format directly —
``read_warc(paths)`` yields the (url, warc_ts, html) subset of
PAGES_SCHEMA, and ``write_warc(ds, out_dir)`` shards a pages Dataset
back out. Reference analog: the upload/intake normalization branch
(``file_storage/__init__.py`` + ``commons/``) — here the container is
the crawl-native one.

Record layout written (and parsed back):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Date: <iso8601>Z\r\n
    WARC-Target-URI: <url>\r\n
    Content-Type: application/http;msgtype=response\r\n
    Content-Length: <len of http block>\r\n
    \r\n
    HTTP/1.1 200 OK\r\n
    Content-Type: text/html\r\n
    Content-Length: <len payload>\r\n
    \r\n
    <payload>\r\n\r\n

Each record is its own gzip member (``zlib`` wbits=31); the reader
splits members with a ``decompressobj`` loop over ``unused_data`` — a
shard never needs to fit decompressed in memory at once, and a reader
can start at any member boundary (the property Common-Crawl range
requests rely on).

Determinism: gzip headers are written with mtime=0 so shard bytes are a
pure function of the records (FIXTURES.md philosophy).
"""
from __future__ import annotations

import datetime as _dt
import os
import zlib
from typing import List

import pyarrow as pa
import ray.data

_CRLF = b"\r\n"


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    # wbits=31 writes a gzip header; zlib sets mtime=0 (deterministic)
    return co.compress(data) + co.flush()


_REASONS = {200: b"OK", 301: b"Moved Permanently", 404: b"Not Found",
            410: b"Gone", 500: b"Internal Server Error"}


def build_record(url: str, ts: _dt.datetime, payload: bytes,
                 status: int = 200) -> bytes:
    """One WARC response record (uncompressed bytes)."""
    reason = _REASONS.get(status, b"Unknown")
    http = (b"HTTP/1.1 " + str(status).encode() + b" " + reason + _CRLF +
            b"Content-Type: text/html" + _CRLF +
            b"Content-Length: " + str(len(payload)).encode() + _CRLF +
            _CRLF + payload)
    warc_date = ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
    head = (b"WARC/1.0" + _CRLF +
            b"WARC-Type: response" + _CRLF +
            b"WARC-Date: " + warc_date + _CRLF +
            b"WARC-Target-URI: " + url.encode() + _CRLF +
            b"Content-Type: application/http;msgtype=response" + _CRLF +
            b"Content-Length: " + str(len(http)).encode() + _CRLF +
            _CRLF)
    return head + http + _CRLF + _CRLF


def parse_warc(data: bytes) -> pa.Table:
    """Parse one .warc.gz shard (or uncompressed WARC bytes) into
    (url, warc_ts, html). Tolerates multi-member and single-stream gzip
    as well as plain WARC."""
    if data[:2] == b"\x1f\x8b":
        chunks: List[bytes] = []
        buf = data
        while buf:
            do = zlib.decompressobj(47)  # gzip or zlib header
            try:
                chunks.append(do.decompress(buf))
                chunks.append(do.flush())
            except zlib.error:
                # truncated/corrupt trailing member: keep every complete
                # member before it (a partial shard from a killed writer
                # must not poison the whole read)
                break
            if not do.unused_data:
                break
            buf = do.unused_data
        data = b"".join(chunks)
    urls: List[str] = []
    tss: List[_dt.datetime] = []
    payloads: List[bytes] = []
    statuses: List[int] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers: dict = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get(b"content-length", b"0"))
        except ValueError:
            clen = -1
        if clen < 0:               # junk/negative Content-Length: skip
            pos = hdr_end + 4      # the record, resume AFTER its header
            continue               # (never rewind — infinite-loop guard)
        block = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if len(block) < clen:
            break                  # truncated record body: drop it
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode()
        try:
            ts = _dt.datetime.strptime(
                headers.get(b"warc-date", b"1970-01-01T00:00:00Z").decode(),
                "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            ts = _dt.datetime(1970, 1, 1)   # malformed date: epoch
        # payload = HTTP block body after its own header terminator;
        # status from the HTTP/1.x status line (0 when unparseable)
        body_at = block.find(_CRLF + _CRLF)
        payloads.append(block[body_at + 4:] if body_at >= 0 else b"")
        status = 0
        if block[:5] == b"HTTP/":
            parts = block.split(_CRLF, 1)[0].split(b" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
        statuses.append(status)
        urls.append(url)
        tss.append(ts)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "http_status": pa.array(statuses, pa.int64()),
    })


def read_warc(paths) -> ray.data.Dataset:
    """.warc.gz shards → Dataset(url, warc_ts, html). One task per
    shard; shards stream through the object store as independent blocks
    (the resumable-partition unit)."""
    files = ray.data.read_binary_files(paths)

    def expand(t: pa.Table) -> pa.Table:
        return pa.concat_tables([parse_warc(b.as_py())
                                 for b in t.column("bytes")])

    return files.map_batches(expand, batch_format="pyarrow")


def write_warc(ds: ray.data.Dataset, out_dir: str) -> List[str]:
    """Pages Dataset → one .warc.gz shard per block. Shard names carry
    the contained doc-id range (deterministic CONTENT per shard set;
    the file layout follows block boundaries, which is why the
    round-trip contract is row-set equality, not byte-identical shards)."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        members = []
        urls = t.column("url").to_pylist()
        for url, ts, payload in zip(urls,
                                    t.column("warc_ts").to_pylist(),
                                    t.column("html").to_pylist()):
            members.append(_gzip_member(build_record(url, ts, payload or b"")))
        # shard name total over ARBITRARY urls: md5 of the sorted url
        # set (deterministic per content, no format assumption)
        import hashlib
        tag = hashlib.md5("\n".join(sorted(urls)).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"shard-{tag}-{len(urls)}.warc.gz")
        with open(path, "wb") as f:
            f.write(b"".join(members))
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(dump, batch_format="pyarrow")
    return [r["path"] for r in manifest.take_all()]


def http_status_census(sf_dir: str) -> "ray.data.Dataset":
    """Planted-status WARC records → per-status census.

    Builds one real WARC response record per document (status planted by
    doc_id arithmetic), round-trips it through the record codec, and
    aggregates what the STATUS-LINE PARSER read back — a wrong reason
    phrase split, Content-Length frame or digit parse breaks the match.
    Statuses: 404 when doc_id%37==3, else 301 when doc_id%41==5, else
    500 when doc_id%53==7, else 200."""
    import numpy as np

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def census(t: pa.Table) -> pa.Table:
        blobs = []
        ids = t.column("doc_id").to_pylist()
        for d in ids:
            if d % 37 == 3:
                st = 404
            elif d % 41 == 5:
                st = 301
            elif d % 53 == 7:
                st = 500
            else:
                st = 200
            blobs.append(build_record(
                f"https://example.org/x/{d:08d}",
                _dt.datetime(2021, 1, 1), b"payload %d" % d, status=st))
        parsed = parse_warc(b"".join(blobs))
        sts = parsed.column("http_status").to_numpy()
        pids = np.fromiter((int(u[-8:])
                            for u in parsed.column("url").to_pylist()),
                           np.int64, len(parsed))
        vals, idx = np.unique(sts, return_inverse=True)
        n = np.bincount(idx)
        mins = np.full(len(vals), np.iinfo(np.int64).max, np.int64)
        maxs = np.full(len(vals), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mins, idx, pids)
        np.maximum.at(maxs, idx, pids)
        return pa.table({"http_status": pa.array(vals, pa.int64()),
                         "partial_n": pa.array(n.astype(np.int64)),
                         "partial_min": pa.array(mins, pa.int64()),
                         "partial_max": pa.array(maxs, pa.int64())})

    rows = ds.map_batches(census, batch_format="pyarrow")
    agg = rows.groupby("http_status").aggregate(
        ray.data.aggregate.Sum("partial_n"),
        ray.data.aggregate.Min("partial_min"),
        ray.data.aggregate.Max("partial_max"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "http_status": t.column("http_status"),
            "n_records": t.column("sum(partial_n)").cast(pa.int64()),
            "min_doc_id": t.column("min(partial_min)").cast(pa.int64()),
            "max_doc_id": t.column("max(partial_max)").cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")
