"""URL-canonicalization dedup (crawl frontier / recrawl hygiene).

A crawl sees the same page under many raw URLs — uppercase hosts,
explicit default ports, tracking query params (utm_*, gclid, fbclid),
fragments, unsorted param order. Canonicalize-then-dedup is the
standard frontier operation (the reference's single-file intake has no
analog; this is crawl-side curation).

Normalization rules (all vectorized — Arrow RE2 extract + numpy lexsort
+ ``pc.binary_join``; no per-row Python):
  N1. scheme + host lowercased.
  N2. default port dropped (``:443`` for https, ``:80`` for http).
  N3. fragment dropped.
  N4. tracking params dropped (utm_*, gclid, fbclid, ref).
  N5. surviving params sorted lexicographically; empty query dropped.

Fixture: ``1 + doc_id % 3`` raw variants per document (canonical /
uppercase-host + default port + tracking + fragment / default port +
tracking), and docs with ``doc_id % 10 == 4`` carry real surviving
params on their first variant so the sort path is exercised. One
groupby on the normalized string — the exact dedup shuffle shape
(moves (url, 1) pairs, pre-combined per batch).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TRACKING_KEYS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                 "utm_content", "gclid", "fbclid", "ref")


def synth_raw_urls(sf_dir: str) -> ray.data.Dataset:
    """Deterministic raw-URL variants per document."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def make(t: pa.Table) -> pa.Table:
        ids, variants, urls = [], [], []
        for d, src in zip(t.column("doc_id").to_pylist(),
                          t.column("source").to_pylist()):
            base = f"https://example.org/{src}/{d:08d}"
            if d % 10 == 4:
                v0 = f"{base}?b={d % 3}&a={d % 7}"
            else:
                v0 = base
            raw = [v0]
            if d % 3 >= 1:
                raw.append(f"HTTPS://EXAMPLE.ORG:443/{src}/{d:08d}"
                           f"?utm_source=feed&fbclid=x{d % 9}#top")
            if d % 3 == 2:
                raw.append(f"https://example.org:443/{src}/{d:08d}"
                           f"?gclid=g{d % 5}&utm_campaign=c")
            for v, u in enumerate(raw):
                ids.append(d)
                variants.append(v)
                urls.append(u)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "variant": pa.array(variants, pa.int64()),
                         "url": pa.array(urls, pa.string())})

    return ds.map_batches(make, batch_format="pyarrow")


def normalize_urls(url: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized N1-N5 normalization of a string array."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    top = pc.extract_regex(
        url,
        r"^(?P<scheme>[^:/?#]+)://(?P<auth>[^/?#]*)"
        r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$")

    def field(name):
        return pc.fill_null(pc.struct_field(top, name), "")

    scheme = pc.utf8_lower(field("scheme"))
    auth = pc.utf8_lower(field("auth"))
    path = field("path")
    query = field("query")

    # host:port split — bracketed IPv6 literals keep their colons; an
    # authority the grammar can't split (userinfo, junk) passes through
    # WHOLE as the host rather than silently collapsing to '' (which
    # would dedupe distinct hosts together)
    hp = pc.extract_regex(
        auth, r"^(?P<host>\[[^\]]*\]|[^:@\[]*)(?::(?P<port>\d+))?$")
    matched = pc.is_valid(hp)
    host = pc.if_else(matched,
                      pc.fill_null(pc.struct_field(hp, "host"), ""), auth)
    port = pc.if_else(matched,
                      pc.fill_null(pc.struct_field(hp, "port"), ""), "")
    default_port = pc.or_(
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")))
    port_part = pc.if_else(
        pc.or_(default_port, pc.equal(port, "")),
        "", pc.binary_join_element_wise(":", port, ""))

    # N4/N5: split params, drop tracking + empties, sort within row
    parts = pc.split_pattern(query, "&")
    flat = parts.values.to_numpy(zero_copy_only=False)
    offs = parts.offsets.to_numpy()
    rows = np.repeat(np.arange(len(parts)), np.diff(offs))
    keys = pc.extract_regex(pa.array(flat, pa.string()), r"^(?P<k>[^=]*)")
    keyarr = pc.fill_null(pc.struct_field(keys, "k"), "").to_numpy(
        zero_copy_only=False)
    keep = ~np.isin(keyarr, TRACKING_KEYS) & (flat != "")
    rows_k, flat_k = rows[keep], flat[keep]
    order = np.lexsort((flat_k, rows_k))          # sorted params per row
    rows_s, flat_s = rows_k[order], flat_k[order]
    counts = np.bincount(rows_s, minlength=len(parts))
    new_offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    sorted_lists = pa.ListArray.from_arrays(
        pa.array(new_offs), pa.array(flat_s, pa.string()))
    joined = pc.binary_join(sorted_lists, "&")
    q_part = pc.if_else(pc.equal(joined, ""), "",
                        pc.binary_join_element_wise("?", joined, ""))

    return pc.binary_join_element_wise(
        scheme, "://", host, port_part, path, q_part, "")


def _dedup_partials(t: pa.Table) -> pa.Table:
    """Shared combiner: batch → one (normalized_url, count) row per
    DISTINCT canonical URL (used by url_dedup AND crawl_frontier so the
    two ops can never diverge on the same input)."""
    norm = normalize_urls(t.column("url"))
    vals, counts = np.unique(
        norm.to_numpy(zero_copy_only=False), return_counts=True)
    return pa.table({"normalized_url": pa.array(vals, pa.string()),
                     "partial": pa.array(counts.astype(np.int64))})


def url_dedup(sf_dir: str) -> ray.data.Dataset:
    """(normalized_url, n_raw) — distinct canonical URLs with how many
    raw variants collapsed into each."""
    ds = synth_raw_urls(sf_dir)
    agg = ds.map_batches(_dedup_partials, batch_format="pyarrow") \
            .groupby("normalized_url").sum("partial")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "normalized_url": t.column("normalized_url"),
            "n_raw": t.column("sum(partial)").cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


# --- frontier composition ----------------------------------------------
_PATHQ_RE = r"^[a-z0-9+.-]+://[^/]*(?P<pathq>.*)$"
_SRC_RE = r"^/(?P<src>[^/]+)/"


def crawl_frontier(sf_dir: str) -> ray.data.Dataset:
    """Frontier composition: raw variants → canonicalize → dedup →
    RFC 9309 robots gate (generic agent, rules matched on path+query
    per the RFC's matched-URI definition) → per-source census
    (source, n_raw, n_canonical, n_allowed).

    Two shuffles, both combiner-compressed: one on the normalized URL
    (the dedup exchange), one tiny per-source rollup."""
    import ray as _ray

    from .robots import (evaluate_rules, parse_robots,
                         robots_txt_for_source, select_group)

    import pyarrow.parquet as pq
    srcs = pc.unique(pq.read_table(f"{sf_dir}/documents.parquet",
                                   columns=["source"]).column("source"))
    compiled = {s: select_group(parse_robots(robots_txt_for_source(s)),
                                "SomeCrawler/1.0")
                for s in srcs.to_pylist()}
    rules_ref = _ray.put(compiled)

    ds = synth_raw_urls(sf_dir)
    per_url = ds.map_batches(_dedup_partials, batch_format="pyarrow") \
                .groupby("normalized_url").sum("partial")

    def gate(t: pa.Table, ref=rules_ref) -> pa.Table:
        rules = _ray.get(ref)
        urls = t.column("normalized_url")
        pathq = pc.fill_null(pc.struct_field(
            pc.extract_regex(urls, _PATHQ_RE), "pathq"), "")
        src = pc.fill_null(pc.struct_field(
            pc.extract_regex(pathq, _SRC_RE), "src"), "")
        srcs_np = src.to_numpy(zero_copy_only=False)
        allowed = np.ones(len(t), bool)
        for s in np.unique(srcs_np):
            m = srcs_np == s
            allowed[m] = evaluate_rules(rules.get(s, []),
                                        pathq.filter(pa.array(m)))
        n_raw = t.column("sum(partial)").to_numpy().astype(np.int64)
        # per-batch per-source combiner
        uniq, idx = np.unique(srcs_np, return_inverse=True)
        raw_sums = np.bincount(idx, weights=n_raw).astype(np.int64)
        canon = np.bincount(idx).astype(np.int64)
        allow = np.bincount(idx, weights=allowed).astype(np.int64)
        return pa.table({"source": pa.array(uniq, pa.string()),
                         "p_raw": pa.array(raw_sums),
                         "p_canonical": pa.array(canon),
                         "p_allowed": pa.array(allow)})

    rolled = per_url.map_batches(gate, batch_format="pyarrow") \
                    .groupby("source").aggregate(
                        ray.data.aggregate.Sum("p_raw"),
                        ray.data.aggregate.Sum("p_canonical"),
                        ray.data.aggregate.Sum("p_allowed"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "n_raw": t.column("sum(p_raw)").cast(pa.int64()),
            "n_canonical": t.column("sum(p_canonical)").cast(pa.int64()),
            "n_allowed": t.column("sum(p_allowed)").cast(pa.int64()),
        })

    return rolled.map_batches(rename, batch_format="pyarrow")
