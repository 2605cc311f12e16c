"""URL parsing / domain statistics / blocklist filtering.

Crawl curation (C4, RefinedWeb, Gopher) gates documents on their source
URL: parse, normalize the host, extract the registered domain, count
path depth / query params, and drop blocklisted domains.  The corpus
tables carry no URL column, so — like ``multimodal.synth_videos`` — the
op synthesizes a deterministic URL per ``doc_id`` (every field is
doc_id arithmetic) and then runs a REAL parser over the strings; the
SQL oracle rebuilds the same URLs and re-parses them with DuckDB's own
string/regex machinery, so the parse itself is checked value-by-value,
not assumed.

The parse stage is fully vectorized: one
``pyarrow.compute.extract_regex`` call per grammar rule (RFC 3986
appendix B's own regex, split into scheme/authority/path/query, then
host:port, then the registered-domain suffix rule) — Arrow's C++ RE2
over the whole column, no per-row Python.  The blocklist is a constant
here; a multi-million-entry production list would be ``ray.put`` once
and probed with ``pc.is_in`` against the broadcast array — the same
pattern either way.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# two-label public suffixes the registered-domain rule must not split
_MULTI_TLDS = ("co.uk",)
BLOCKLIST = ("site7.net", "site13.io", "site21.org", "site3.io")

_TLDS = ("com", "org", "net", "io", "co.uk")


def synth_urls_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic URL per doc (scheme/sub/host-case/port/path/query
    all doc_id arithmetic; see oracle SQL for the mirror construction)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def make(t: pa.Table) -> pa.Table:
        urls = []
        for d in t.column("doc_id").to_pylist():
            scheme = "http" if d % 7 == 0 else "https"
            sub = "www." if d % 3 == 0 else ""
            hb = f"{sub}site{d % 50}.{_TLDS[d % 5]}"
            host = hb.upper() if d % 13 == 5 else hb
            port = ":8080" if d % 11 == 3 else ""
            path = "".join(f"/p{i}" for i in range(d % 4))
            query = f"?q=term{d % 9}&page=2" if d % 6 == 1 else ""
            urls.append(f"{scheme}://{host}{port}{path}{query}")
        return pa.table({"doc_id": t.column("doc_id"),
                         "url": pa.array(urls, pa.string())})

    return ds.map_batches(make, batch_format="pyarrow")


def _str_or_empty(struct_col, field: str) -> pa.Array:
    return pc.fill_null(pc.struct_field(struct_col, field), "")


def parse_urls(t: pa.Table) -> pa.Table:
    """Vectorized URL parse: url → components + domain signals."""
    url = t.column("url")
    top = pc.extract_regex(
        url, r"^(?P<scheme>[^:/?#]+)://(?P<auth>[^/?#]*)"
             r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?$")
    scheme = _str_or_empty(top, "scheme")
    auth = _str_or_empty(top, "auth")
    path = _str_or_empty(top, "path")
    query = _str_or_empty(top, "query")

    hp = pc.extract_regex(auth, r"^(?P<host>[^:]*)(?::(?P<port>\d+))?$")
    host = pc.utf8_lower(_str_or_empty(hp, "host"))
    port_s = _str_or_empty(hp, "port")

    # default port by scheme where none is written (all-Arrow: '' → null
    # → cast → coalesce with the scheme default)
    port = pc.coalesce(
        pc.cast(pc.if_else(pc.equal(port_s, ""),
                           pa.scalar(None, pa.string()), port_s),
                pa.int64()),
        pc.if_else(pc.equal(scheme, "http"),
                   pa.scalar(80, pa.int64()), pa.scalar(443, pa.int64())))

    # registered domain: last two labels, or last three when the
    # two-label suffix is a public suffix (leftmost-first alternation)
    multi = "|".join(s.replace(".", r"\.") for s in _MULTI_TLDS)
    rd = _str_or_empty(pc.extract_regex(
        host, r"(?P<rd>[^.]+\.(?:" + multi + r")|[^.]+\.[^.]+)$"), "rd")
    tld = _str_or_empty(pc.extract_regex(
        rd, r"^[^.]+\.(?P<tld>.+)$"), "tld")

    empty_path = pc.equal(path, "").to_numpy(zero_copy_only=False)
    depth = np.where(empty_path, 0,
                     pc.count_substring(path, "/")
                     .to_numpy(zero_copy_only=False))
    empty_q = pc.equal(query, "").to_numpy(zero_copy_only=False)
    nq = np.where(empty_q, 0,
                  pc.count_substring(query, "&")
                  .to_numpy(zero_copy_only=False) + 1)
    blocked = pc.is_in(rd, value_set=pa.array(BLOCKLIST))

    return pa.table({
        "doc_id": t.column("doc_id"),
        "url": url,
        "scheme": scheme,
        "host": host,
        "port": port,
        "registered_domain": rd,
        "tld": tld,
        "path_depth": pa.array(depth.astype(np.int64), pa.int64()),
        "n_query_params": pa.array(nq.astype(np.int64), pa.int64()),
        "is_blocked": blocked})


def url_stats(sf_dir: str) -> ray.data.Dataset:
    """Synth URLs → vectorized parse → per-doc URL signals."""
    return synth_urls_from_documents(sf_dir).map_batches(
        parse_urls, batch_format="pyarrow")


def filter_blocked(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Library path: drop rows whose registered domain is blocklisted."""
    return ds.map_batches(
        lambda t: t.filter(pc.invert(t["is_blocked"])),
        batch_format="pyarrow")
