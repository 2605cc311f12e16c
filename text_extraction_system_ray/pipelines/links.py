"""Link-graph extraction over the Common-Crawl-style pages corpus.

Crawl curation needs the hyperlink structure of the corpus (PageRank
seeds, spam-domain discovery, anchor-text mining — the reference's
text-extraction scope stops at per-document text, but every production
crawl pipeline pairs it with a link extractor over the same pages
table). Reference analog: the per-document parse loop in
``data_extract/data_extract.py:51-204`` — here the parse target is the
``<a href>`` edge set instead of the text layer.

Design (Ray-Data-first, zero shuffle until the final tiny aggregate):

  pages ──map_batches──▶ per-batch href scan (compiled bytes regex, no
          utf-8 decode of the payload) ──▶ PARTIAL in-degree counts per
          target doc (np.unique combiner inside the batch)
        ──groupby(target).sum──▶ global in-degree table.

The combiner means the shuffle moves one row per *distinct* target per
batch (≪ one row per edge); at 10^12 pages the exchanged volume is the
distinct-target count, the same shape as the vocab_topk plan.

The synthetic corpus plants, for every HTML page, ``1 + doc_id % 5``
"related" links to targets ``(doc_id * 31 + 97 * j) % n_docs`` inside a
``<nav class="related">`` container (boilerplate — stripped from the
extracted text, so the byte-identity extraction contract is untouched).
The DuckDB oracle regenerates the exact edge set with a lateral series
join, making both queries hash-checked end-to-end.
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

from ..sources.pages import pages_parquet, read_pages

# href scanner over the RAW bytes payload (no decode): double- or
# single-quoted attribute value. Attribute-value entity decoding is not
# needed for the /doc/ namespace (digits only); external links are only
# counted, not resolved.
#
# SCOPE: a raw-bytes scan also sees href= text inside comments/<script>
# strings (the classic regex-crawler tradeoff, chosen for zero-decode
# throughput; title extraction below deliberately takes the opposite
# tradeoff and runs the real tokenizer). The planted fixture keeps all
# hrefs in live markup, so the oracle pins the scan exactly there.
_HREF_RE = re.compile(rb"""href\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.IGNORECASE)
_BASE_RE = re.compile(
    rb"""<base\s[^>]*href\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.IGNORECASE)
_INTERNAL_RE = re.compile(rb"^/doc/(\d{8})$")
# internal links AFTER RFC 3986 resolution against the page URL —
# matches path-absolute, relative and absolute spellings alike
_INTERNAL_ABS_RE = re.compile(r"^https://example\.org/doc/(\d{8})$")


def _scan_batch(t: pa.Table) -> dict:
    """Extract hrefs from one Arrow batch, RESOLVING each against the
    page URL (RFC 3986 §5 — crawl hrefs are mostly relative; the
    resolver is pinned by the spec's own §5.4 vectors). Returns
    (doc_ids, per-doc internal/external counts, flat internal-target
    array)."""
    from ..functions.urlresolve import resolve

    urls = t.column("url").to_pylist()
    payloads = t.column("html").to_pylist()
    n = len(urls)
    doc_ids = np.fromiter((int(u[-8:]) for u in urls), np.int64, n)
    n_int = np.zeros(n, np.int64)
    n_ext = np.zeros(n, np.int64)
    targets: list = []
    for i, (page_url, payload) in enumerate(zip(urls, payloads)):
        if not payload or not payload.startswith(b"<html"):
            continue
        # <base href> overrides the resolution base (itself resolved
        # against the page URL, per HTML's document-base rules)
        bm = _BASE_RE.search(payload)
        base_span = (-1, -1)
        if bm is not None:
            base_href = (bm.group(1) if bm.group(1) is not None
                         else bm.group(2)).decode("utf-8", errors="replace")
            page_url = resolve(page_url, base_href)
            base_span = bm.span()
        ints = 0
        exts = 0
        for m in _HREF_RE.finditer(payload):
            if base_span[0] <= m.start() < base_span[1]:
                continue                     # the <base> tag's own href
            href = (m.group(1) if m.group(1) is not None
                    else m.group(2)).decode("utf-8", errors="replace")
            im = _INTERNAL_ABS_RE.match(resolve(page_url, href))
            if im:
                ints += 1
                targets.append(int(im.group(1)))
            else:
                exts += 1
        n_int[i] = ints
        n_ext[i] = exts
    return {"doc_ids": doc_ids, "n_int": n_int, "n_ext": n_ext,
            "targets": np.asarray(targets, np.int64)}


def _indegree_partials(t: pa.Table) -> pa.Table:
    """Combiner: batch → one row per DISTINCT target (pre-aggregation
    before the groupby, so the shuffle moves counts, not edges)."""
    s = _scan_batch(t)
    tgt, cnt = np.unique(s["targets"], return_counts=True)
    return pa.table({"target_doc_id": pa.array(tgt, pa.int64()),
                     "partial": pa.array(cnt.astype(np.int64), pa.int64())})


def _pages(sf_dir: str) -> ray.data.Dataset:
    """Pages table, pruned at the read to the two columns the link ops
    consume (url + payload) — a full-width read for a 2-column scan is
    wrong at crawl scale."""
    return read_pages(pages_parquet(sf_dir), columns=["url", "html"])


def link_graph(sf_dir: str) -> ray.data.Dataset:
    """Global in-degree per linked-to document: (target_doc_id, indegree)."""
    ds = _pages(sf_dir)
    partials = ds.map_batches(_indegree_partials, batch_format="pyarrow")
    agg = partials.groupby("target_doc_id").sum("partial")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "target_doc_id": t.column("target_doc_id"),
            "indegree": t.column("sum(partial)").cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def _outlink_batch(t: pa.Table) -> pa.Table:
    s = _scan_batch(t)
    keep = (s["n_int"] + s["n_ext"]) > 0
    return pa.table({
        "doc_id": pa.array(s["doc_ids"][keep], pa.int64()),
        "n_internal": pa.array(s["n_int"][keep], pa.int64()),
        "n_external": pa.array(s["n_ext"][keep], pa.int64()),
    })


def outlink_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-HTML-page outlink counts: (doc_id, n_internal, n_external).

    Embarrassingly parallel — no shuffle at all; the oracle recomputes
    both counts from doc_id arithmetic (internal = 1 + doc_id % 5,
    external = the 6 static boilerplate anchors + the canonical link)."""
    ds = _pages(sf_dir)
    return ds.map_batches(_outlink_batch, batch_format="pyarrow")


# --- title extraction --------------------------------------------------
# the FROZEN whitespace/control rules (H5) — imported, not copied
from ..config import PipelineConfig  # noqa: E402
from ..functions.html_extract import _CTRL_RE, _WS_RE, parse_html_blocks  # noqa: E402

_TITLE_CFG = PipelineConfig()


def title_of_payload(payload: bytes) -> str | None:
    """Title via the frozen H7 parser rule itself — a regex shortcut
    diverges from the parser on rawtext/comment/dropped-subtree edges
    (<title> inside <script>/<svg>/<!-- -->, unclosed titles), so the
    op runs the real tokenizer; titles are H7 captures, not blocks, and
    the cost is ~0.3 ms/doc (bench: html_title_extract 0.36 s @ sf0.1)."""
    text = payload.decode("utf-8", errors="replace")
    if text.startswith("\ufeff"):
        text = text[1:]
    _, title, _ = parse_html_blocks(text, _TITLE_CFG)
    return title


def _title_batch(t: pa.Table) -> pa.Table:
    urls = t.column("url").to_pylist()
    payloads = t.column("html").to_pylist()
    ids, titles = [], []
    for u, payload in zip(urls, payloads):
        if not payload or not payload.startswith(b"<html"):
            continue
        title = title_of_payload(payload)
        if title is not None:
            ids.append(int(u[-8:]))
            titles.append(title)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "title": pa.array(titles, pa.string())})


def html_title_extract(sf_dir: str) -> ray.data.Dataset:
    """Per-row STRING parity with the oracle: (doc_id, title) for every
    HTML page — the value hash covers the title bytes themselves, so a
    wrong entity decode / whitespace rule breaks the match."""
    ds = _pages(sf_dir)
    return ds.map_batches(_title_batch, batch_format="pyarrow")


# --- head metadata extraction ------------------------------------------
# Generic void-tag attribute scan (the block parser only materializes
# attrs when a boilerplate-relevant key is present; head metadata needs
# the full attr map, so this path parses them with the same grammar).
_META_TAG_RE = re.compile(rb"<(meta|link)\b([^>]*)>", re.IGNORECASE)
_ATTR_B_RE = re.compile(
    rb"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*"
    rb"(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))")


def meta_of_payload(payload: bytes) -> dict:
    """Pull (description, canonical) out of head metadata. Attribute
    order-insensitive; first match wins (browser behavior)."""
    out = {"description": None, "canonical": None}
    for m in _META_TAG_RE.finditer(payload):
        tag = m.group(1).lower()
        attrs = {}
        for am in _ATTR_B_RE.finditer(m.group(2)):
            v = am.group(2) or am.group(3) or am.group(4) or b""
            attrs[am.group(1).lower()] = v
        if (tag == b"meta" and out["description"] is None
                and attrs.get(b"name", b"").lower() == b"description"):
            out["description"] = attrs.get(b"content", b"").decode(
                "utf-8", errors="replace")
        elif (tag == b"link" and out["canonical"] is None
                and attrs.get(b"rel", b"").lower() == b"canonical"):
            out["canonical"] = attrs.get(b"href", b"").decode(
                "utf-8", errors="replace")
        if out["description"] is not None and out["canonical"] is not None:
            break
    return out


def _meta_batch(t: pa.Table) -> pa.Table:
    urls = t.column("url").to_pylist()
    payloads = t.column("html").to_pylist()
    ids, descs, canons = [], [], []
    for u, payload in zip(urls, payloads):
        if not payload or not payload.startswith(b"<html"):
            continue
        m = meta_of_payload(payload)
        if m["description"] is None and m["canonical"] is None:
            continue
        ids.append(int(u[-8:]))
        descs.append(m["description"])
        canons.append(m["canonical"])
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "description": pa.array(descs, pa.string()),
                     "canonical": pa.array(canons, pa.string())})


def meta_extract(sf_dir: str) -> ray.data.Dataset:
    """Per-row STRING parity for head metadata: (doc_id, description,
    canonical) — the hash covers both strings byte-for-byte."""
    return _pages(sf_dir).map_batches(_meta_batch, batch_format="pyarrow")


# --- anchor-text aggregation -------------------------------------------
# Anchor text is the classic web ranking/mining signal; here the planted
# internal links carry text 'Related j'. Plan: per-batch (target,
# anchor) distinct partials -> multi-key groupby sum (exact pair
# counts) -> standard-aggregate groupby on target (Count rows = distinct
# anchors, Sum = inbound, Min = lexicographic top anchor). Both wide
# steps are plain hash aggregates over combiner-compressed rows — no
# per-tiny-group Python.
_A_INNER_RE = re.compile(
    rb"""<a\s[^>]*href\s*=\s*(?:"([^"]*)"|'([^']*)')[^>]*>(.*?)</a>""",
    re.IGNORECASE | re.DOTALL)


def _anchor_pairs_batch(t: pa.Table) -> pa.Table:
    import html as _html

    from ..functions.urlresolve import resolve

    urls = t.column("url").to_pylist()
    payloads = t.column("html").to_pylist()
    pairs: dict = {}
    for page_url, payload in zip(urls, payloads):
        if not payload or not payload.startswith(b"<html"):
            continue
        for m in _A_INNER_RE.finditer(payload):
            href = (m.group(1) if m.group(1) is not None
                    else m.group(2)).decode("utf-8", errors="replace")
            # same RFC 3986 resolution rule as _scan_batch, so relative
            # and absolute spellings contribute anchors identically
            im = _INTERNAL_ABS_RE.match(resolve(page_url, href))
            if im is None:
                continue
            raw = m.group(3).decode("utf-8", errors="replace")
            if "&" in raw:
                raw = _html.unescape(raw)
            anchor = _WS_RE.sub(" ", _CTRL_RE.sub("", raw)).strip()
            key = (int(im.group(1)), anchor)
            pairs[key] = pairs.get(key, 0) + 1
    if not pairs:
        return pa.table({"target_doc_id": pa.array([], pa.int64()),
                         "anchor": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    tgt, anc = zip(*pairs.keys())
    return pa.table({"target_doc_id": pa.array(tgt, pa.int64()),
                     "anchor": pa.array(anc, pa.string()),
                     "cnt": pa.array(list(pairs.values()), pa.int64())})


def anchor_text_stats(sf_dir: str) -> ray.data.Dataset:
    """(target_doc_id, n_inbound, n_distinct_anchors, top_anchor)."""
    import ray.data.aggregate as agg

    pairs = _pages(sf_dir).map_batches(_anchor_pairs_batch,
                                       batch_format="pyarrow")
    exact = pairs.groupby(["target_doc_id", "anchor"]).sum("cnt")
    out = exact.groupby("target_doc_id").aggregate(
        agg.Sum("sum(cnt)"), agg.Count(), agg.Min("anchor"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "target_doc_id": t.column("target_doc_id"),
            "n_inbound": t.column("sum(sum(cnt))").cast(pa.int64()),
            "n_distinct_anchors": t.column("count()").cast(pa.int64()),
            "top_anchor": t.column("min(anchor)"),
        })

    return out.map_batches(rename, batch_format="pyarrow")


# --- JSON-LD structured-data extraction --------------------------------
# schema.org blocks are the standard structured-data channel on the
# web; the extraction pipeline DROPS script subtrees from text (rule
# H3), so structured data needs its own scan: find
# <script type="application/ld+json"> blocks, json-parse (stdlib), and
# project typed fields. Per-row parity covers string AND integer fields.
_JSONLD_RE = re.compile(
    rb"""<script\s[^>]*type\s*=\s*["']application/ld\+json["'][^>]*>"""
    rb"(.*?)</script>", re.IGNORECASE | re.DOTALL)


def jsonld_of_payload(payload: bytes) -> dict | None:
    import json as _json
    m = _JSONLD_RE.search(payload)
    if m is None:
        return None
    try:
        obj = _json.loads(m.group(1).decode("utf-8", errors="replace"))
    except ValueError:
        return None
    return obj if isinstance(obj, dict) else None


def _jsonld_batch(t: pa.Table) -> pa.Table:
    urls = t.column("url").to_pylist()
    payloads = t.column("html").to_pylist()
    ids, types, heads, chars, pubs = [], [], [], [], []
    for u, payload in zip(urls, payloads):
        if not payload or not payload.startswith(b"<html"):
            continue
        obj = jsonld_of_payload(payload)
        if obj is None:
            continue
        ids.append(int(u[-8:]))
        # real schema.org blocks carry list-valued @type and null /
        # non-numeric fields — null-fill rather than kill the batch
        ty = obj.get("@type")
        types.append(ty if isinstance(ty, str) else
                     (ty[0] if isinstance(ty, list) and ty
                      and isinstance(ty[0], str) else None))
        hl = obj.get("headline")
        heads.append(hl if isinstance(hl, str) else None)
        cc = obj.get("charCount")
        chars.append(cc if isinstance(cc, int)
                     and not isinstance(cc, bool) else -1)
        pub = obj.get("publisher")
        if isinstance(pub, dict):              # nested Organization form
            pub = pub.get("name")
        pubs.append(pub if isinstance(pub, str) else None)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "jsonld_type": pa.array(types, pa.string()),
                     "headline": pa.array(heads, pa.string()),
                     "char_count": pa.array(chars, pa.int64()),
                     "publisher": pa.array(pubs, pa.string())})


def jsonld_extract(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, jsonld_type, headline, char_count, publisher) for every
    HTML page carrying a schema.org block."""
    return _pages(sf_dir).map_batches(_jsonld_batch, batch_format="pyarrow")


# --- triangle counting over the link graph -----------------------------
def _edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct directed edges (src_doc, dst_doc) extracted from the
    HTML payloads (self-loops dropped)."""
    def edge_batch(t: pa.Table) -> pa.Table:
        s = _scan_batch_edges(t)
        return s

    return _pages(sf_dir).map_batches(edge_batch, batch_format="pyarrow")


def _scan_batch_edges(t: pa.Table) -> pa.Table:
    from ..functions.urlresolve import resolve
    urls = t.column("url").to_pylist()
    payloads = t.column("html").to_pylist()
    pairs = set()
    for page_url, payload in zip(urls, payloads):
        if not payload or not payload.startswith(b"<html"):
            continue
        src = int(page_url[-8:])
        for m in _HREF_RE.finditer(payload):
            href = (m.group(1) if m.group(1) is not None
                    else m.group(2)).decode("utf-8", errors="replace")
            im = _INTERNAL_ABS_RE.match(resolve(page_url, href))
            if im:
                dst = int(im.group(1))
                if dst != src:
                    pairs.add((src, dst))
    src_a, dst_a = (zip(*sorted(pairs)) if pairs else ((), ()))
    return pa.table({"src": pa.array(list(src_a), pa.int64()),
                     "dst": pa.array(list(dst_a), pa.int64())})


# Middle nodes whose wedge potential in(v)·out(v) exceeds this cap are
# counted via the broadcast probe path instead of the wedge join — the
# join would otherwise emit in(v)·out(v) rows into one hash partition
# (the classic skewed-join explosion). Tests monkeypatch this to 0 /
# +inf to pin both paths equal.
TRIANGLE_WEDGE_CAP = 1_000_000
# Below this many (batch-deduped) pair rows the whole count runs as one
# vectorized numpy kernel on the driver — the distributed plan's three
# shuffles cost seconds of fixed overhead that dwarf kilobyte inputs.
# The distributed plan is the real plan at scale; tests monkeypatch this
# to 0 and pin both plans equal (the dedup_exact house pattern).
TRIANGLE_DRIVER_EDGE_LIMIT = 2_000_000
# …but a small edge set can still hide a hub with in·out wedge blowup;
# past this total the driver kernel defers to the distributed plan.
TRIANGLE_DRIVER_WEDGE_LIMIT = 50_000_000


def _join_partitions() -> int:
    """Cluster-derived partition count (VERDICT r4 item 3) — shared
    policy lives in ``pipelines.util.join_partitions``."""
    from .util import join_partitions
    return join_partitions()


def link_triangles(sf_dir: str) -> pa.Table:
    """Transitive-triangle count over the link graph: ordered triples
    (u,v,w), all distinct, with edges u→v, v→w and u→w.

    Scale shape (VERDICT r4 item 3): the batch-deduped pair scan is
    MATERIALIZED exactly once — every consumer (count, dedupe, degree
    pass, both join sides) reads the pinned blocks instead of
    re-executing the pages-scan lineage (~4× before). Small edge sets
    (≤ ``TRIANGLE_DRIVER_EDGE_LIMIT``) finish in one numpy kernel on
    the driver; larger ones run the distributed two-join wedge plan
    with cluster-derived partition counts and hot-middle-node handling
    (``_distributed_triangles``). Output: one row
    (n_edges, n_triangles)."""
    raw = _edges(sf_dir).materialize()     # batch-deduped (src,dst) pairs
    if raw.count() <= TRIANGLE_DRIVER_EDGE_LIMIT:
        res = _driver_triangles(raw)
        if res is not None:
            return res
    return _distributed_triangles(raw)


def _driver_triangles(raw: "ray.data.Dataset") -> pa.Table | None:
    """Guarded driver finish: distinct-dedupe, degree pass and wedge
    close all as vectorized numpy over packed ``(src<<32)|dst`` keys
    (doc ids are 8 decimal digits < 2^31). Returns None when the wedge
    total exceeds ``TRIANGLE_DRIVER_WEDGE_LIMIT`` (hub blowup — the
    distributed plan's hot-node path owns that regime)."""
    df = raw.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    keys = np.unique((src.astype(np.uint64) << np.uint64(32))
                     | dst.astype(np.uint64))
    u = (keys >> np.uint64(32)).astype(np.int64)     # sorted by (u, v)
    v = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
    n_edges = int(keys.size)
    if n_edges == 0:
        return pa.table({"n_edges": pa.array([0], pa.int64()),
                         "n_triangles": pa.array([0], pa.int64())})
    # out-adjacency grouped by source (u is sorted): group starts+counts
    nodes, first, outdeg = np.unique(u, return_index=True,
                                     return_counts=True)
    # wedges through each edge (a,b): every out-edge of b
    pos = np.searchsorted(nodes, dst_mid := v)
    has_out = (pos < nodes.size) & (nodes[np.minimum(pos, nodes.size - 1)]
                                    == dst_mid)
    rep = np.where(has_out, outdeg[np.minimum(pos, nodes.size - 1)], 0)
    total_wedges = int(rep.sum())
    if total_wedges > TRIANGLE_DRIVER_WEDGE_LIMIT:
        return None
    # flat gather of each wedge's (u=a, w=c) with the repeat-offset trick
    starts = np.where(has_out, first[np.minimum(pos, nodes.size - 1)], 0)
    cum = np.concatenate(([0], np.cumsum(rep)[:-1]))
    idx = (np.arange(total_wedges, dtype=np.int64)
           - np.repeat(cum, rep) + np.repeat(starts, rep))
    wedge_u = np.repeat(u, rep)
    wedge_w = v[idx]
    closed = np.isin((wedge_u.astype(np.uint64) << np.uint64(32))
                     | wedge_w.astype(np.uint64), keys)
    n_tri = int(np.count_nonzero(closed & (wedge_u != wedge_w)))
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_triangles": pa.array([n_tri], pa.int64())})


def _distributed_triangles(raw: "ray.data.Dataset") -> pa.Table:
    """The at-scale plan: hash-shuffle distinct, one-shuffle degree
    pass, then the standard two-join wedge build/close — with skewed
    middle nodes (in(v)·out(v) > ``TRIANGLE_WEDGE_CAP``) excluded from
    the wedge join and counted by broadcasting their in/out neighbor
    sets and probing every edge batch with vectorized ``np.isin`` —
    O(|E|·n_hot) spread across the cluster instead of an exploding hash
    partition. Partitioning assumption: Σ hot-node adjacency fits the
    object store (top-k hot nodes, not the full graph)."""
    import pyarrow.compute as pc

    # distinct edges corpus-wide (batch combiner already dedupes within
    # a batch; the groupby dedupes across batches)
    distinct = raw.groupby(["src", "dst"]).count()

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"), "dst": t.column("dst")})

    e1 = distinct.map_batches(project, batch_format="pyarrow").materialize()
    n_edges = e1.count()
    nparts = _join_partitions()

    # wedge potential per middle node in ONE shuffle: two partial rows
    # per edge (out for src, in for dst), summed per node — no
    # node-table join (it cost more than both wedge joins combined)
    def deg_rows(t: pa.Table) -> pa.Table:
        s, s_n = np.unique(t.column("src").to_numpy(), return_counts=True)
        d, d_n = np.unique(t.column("dst").to_numpy(), return_counts=True)
        return pa.table({
            "node": pa.array(np.concatenate([s, d]), pa.int64()),
            "out_n": pa.array(np.concatenate(
                [s_n, np.zeros(d.size, np.int64)]), pa.int64()),
            "in_n": pa.array(np.concatenate(
                [np.zeros(s.size, np.int64), d_n]), pa.int64())})

    deg = e1.map_batches(deg_rows, batch_format="pyarrow") \
            .groupby("node").sum(["out_n", "in_n"])
    hot_tbl = deg.map_batches(
        lambda t: pa.table({"v": pc.filter(
            t.column("node"),
            pc.greater(pc.multiply(t.column("sum(out_n)"),
                                   t.column("sum(in_n)")),
                       TRIANGLE_WEDGE_CAP))}),
        batch_format="pyarrow")
    hot = np.asarray([r["v"] for r in hot_tbl.take_all()], np.int64)

    n_tri = 0
    if hot.size:
        n_tri += _hot_triangles(e1, hot)

    def drop_hot_mid(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(
                t.column(col), value_set=pa.array(hot, pa.int64()))))
        return fn

    left = e1
    mid = e1
    if hot.size:
        left = e1.map_batches(drop_hot_mid("dst"),
                              batch_format="pyarrow").materialize()
        mid = e1.map_batches(drop_hot_mid("src"),
                             batch_format="pyarrow").materialize()
        if left.count() == 0 or mid.count() == 0:
            # no cold wedge can form (an empty Dataset has no schema for
            # the hash join to bind against — skip, hot path counted all)
            return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                             "n_triangles": pa.array([n_tri], pa.int64())})
    # wedges: u→v joined v→w on the (cold) middle node
    e2 = mid.map_batches(
        lambda t: pa.table({"v2": t.column("src"), "w": t.column("dst")}),
        batch_format="pyarrow")
    wedges = left.join(e2, join_type="inner", num_partitions=nparts,
                       on=("dst",), right_on=("v2",))
    # close the wedge: (u, w) must itself be an edge; drop u == w
    e3 = e1.map_batches(
        lambda t: pa.table({"u2": t.column("src"), "w2": t.column("dst"),
                            "closed": pa.array([1] * t.num_rows,
                                               pa.int64())}),
        batch_format="pyarrow")
    closed = wedges.join(e3, join_type="inner", num_partitions=nparts,
                         on=("src", "w"), right_on=("u2", "w2"))

    def count_valid(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("src"), t.column("w"))
        return pa.table({"n": pa.array([pc.sum(pc.cast(keep, pa.int64()))
                                        .as_py() or 0], pa.int64())})

    n_tri += sum(r["n"] for r in
                 closed.map_batches(count_valid,
                                    batch_format="pyarrow").take_all())
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_triangles": pa.array([n_tri], pa.int64())})


def _hot_triangles(e1: "ray.data.Dataset", hot: np.ndarray) -> int:
    """Triangles whose MIDDLE node is hot: broadcast each hot node's
    in/out neighbor sets (``ray.put`` once, read per task) and probe
    every distinct edge (u,w) with vectorized membership tests —
    u ∈ in(v) ∧ w ∈ out(v) ∧ u ≠ w closes a transitive triangle."""
    import ray as _ray
    import pyarrow.compute as pc

    hot_arr = pa.array(hot, pa.int64())
    adj_in: dict = {int(v): [] for v in hot}
    adj_out: dict = {int(v): [] for v in hot}

    def hot_adj(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        m_in = pc.is_in(t.column("dst"), value_set=hot_arr).to_numpy(
            zero_copy_only=False)
        m_out = pc.is_in(t.column("src"), value_set=hot_arr).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "v": pa.array(np.concatenate([dst[m_in], src[m_out]]),
                          pa.int64()),
            "n": pa.array(np.concatenate([src[m_in], dst[m_out]]),
                          pa.int64()),
            "is_in": pa.array(np.concatenate(
                [np.ones(int(m_in.sum()), bool),
                 np.zeros(int(m_out.sum()), bool)]))})

    for r in e1.map_batches(hot_adj, batch_format="pyarrow") \
               .take_all():
        (adj_in if r["is_in"] else adj_out)[int(r["v"])].append(int(r["n"]))

    sets_ref = _ray.put({v: (np.asarray(sorted(adj_in[v]), np.int64),
                             np.asarray(sorted(adj_out[v]), np.int64))
                         for v in adj_in})

    def probe(t: pa.Table) -> pa.Table:
        sets = _ray.get(sets_ref)
        u = t.column("src").to_numpy()
        w = t.column("dst").to_numpy()
        total = 0
        for _v, (ins, outs) in sets.items():
            if ins.size and outs.size:
                total += int(np.count_nonzero(
                    np.isin(u, ins) & np.isin(w, outs) & (u != w)))
        return pa.table({"n": pa.array([total], pa.int64())})

    return sum(r["n"] for r in
               e1.map_batches(probe, batch_format="pyarrow").take_all())


# ------------------------------------------------ connected components

# same house guard pattern as link_triangles: small edge sets finish in
# one numpy union-find on the driver; larger ones run the distributed
# min-label propagation plan. Tests pin the plans equal.
COMPONENT_DRIVER_EDGE_LIMIT = 2_000_000
COMPONENT_MAX_ITERS = 64


def link_components(sf_dir: str) -> pa.Table:
    """Weakly-connected components of the link graph: one row per node
    ``(node, component)`` where ``component`` is the smallest node id
    in the component (a canonical, order-free label).

    Scale shape: the deduped pair scan is materialized once; above the
    driver guard the plan is iterative MIN-LABEL PROPAGATION — labels
    live as a ``(node, lbl)`` Dataset co-partitioned with the
    (undirected) edge list by hash(node), each round is one hash join
    (labels⋈edges) + one ``groupby(node).min`` over the message union,
    and convergence is detected with a tiny changed-row count — the
    same no-driver-vector discipline as ``pagerank_ranks_ds``. Label
    links from the previous round feed back as SHORTCUT edges
    (pointer jumping), so convergence is O(log diameter) rounds and
    the 64-round cap covers any real graph; non-convergence raises
    instead of returning silently-wrong labels."""
    raw = _edges(sf_dir).materialize()
    if raw.count() <= COMPONENT_DRIVER_EDGE_LIMIT:
        return _driver_components(raw)
    return _distributed_components(raw)


def _driver_components(raw: "ray.data.Dataset") -> pa.Table:
    df = raw.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for s, d in zip(src, dst):
        ra, rb = find(idx[int(s)]), find(idx[int(d)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    comp_min: dict = {}
    for i, n in enumerate(nodes):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, int(n)), int(n))
    labels = np.array([comp_min[find(i)] for i in range(len(nodes))],
                      np.int64)
    order = np.argsort(nodes)
    return pa.table({"node": pa.array(nodes[order], pa.int64()),
                     "component": pa.array(labels[order], pa.int64())})


def _distributed_components(raw: "ray.data.Dataset") -> pa.Table:
    import pyarrow.compute as pc

    nparts = _join_partitions()
    # undirected view, deduped corpus-wide
    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table({
            "a": pa.array(np.concatenate([s, d]), pa.int64()),
            "b": pa.array(np.concatenate([d, s]), pa.int64())})

    edges = (raw.map_batches(both_dirs, batch_format="pyarrow")
             .groupby(["a", "b"]).count()
             .map_batches(lambda t: pa.table({"a": t.column("a"),
                                              "b": t.column("b")}),
                          batch_format="pyarrow")
             .materialize())

    def node_rows(t: pa.Table) -> pa.Table:
        n = np.unique(t.column("a").to_numpy())
        return pa.table({"node": pa.array(n, pa.int64()),
                         "lbl": pa.array(n, pa.int64())})

    labels = (edges.map_batches(node_rows, batch_format="pyarrow")
              .groupby("node").min("lbl")
              .map_batches(lambda t: pa.table(
                  {"node": t.column("node"),
                   "lbl": t.column("min(lbl)")}),
                  batch_format="pyarrow").materialize())

    def min_msgs(t: pa.Table) -> pa.Table:
        # per-batch combiner: one (node=b, lbl=min) row per distinct b
        b = t.column("b").to_numpy()
        lbl = t.column("lbl").to_numpy()
        order = np.argsort(b, kind="stable")
        bs, ls = b[order], lbl[order]
        starts = (np.concatenate([[0], np.flatnonzero(np.diff(bs)) + 1])
                  if len(bs) else np.zeros(0, np.int64))
        mins = (np.minimum.reduceat(ls, starts)
                if len(bs) else np.zeros(0, np.int64))
        return pa.table({"node": pa.array(bs[starts], pa.int64()),
                         "lbl": pa.array(mins, pa.int64())})

    def label_edges(t: pa.Table) -> pa.Table:
        # SHORTCUT edges node↔label (both directions, self-pairs
        # dropped): each round the min label then propagates through
        # last round's label links as well as the graph, the classic
        # pointer-jumping trick — convergence in O(log diameter)
        # rounds instead of O(diameter), so a 64-round cap covers any
        # real graph. A label is always in the node's own component,
        # so shortcutting never merges distinct components.
        node = t.column("node").to_numpy()
        lbl = t.column("lbl").to_numpy()
        keep = node != lbl
        n, l = node[keep], lbl[keep]
        return pa.table({
            "a": pa.array(np.concatenate([n, l]), pa.int64()),
            "b": pa.array(np.concatenate([l, n]), pa.int64())})

    converged = False
    for _ in range(COMPONENT_MAX_ITERS):
        aug = edges.union(
            labels.map_batches(label_edges, batch_format="pyarrow"))
        msgs = (aug.join(labels, join_type="inner",
                         num_partitions=nparts,
                         on=("a",), right_on=("node",))
                .map_batches(min_msgs, batch_format="pyarrow"))
        new_labels = (msgs.union(labels)
                      .groupby("node").min("lbl")
                      .map_batches(lambda t: pa.table(
                          {"node": t.column("node"),
                           "lbl": t.column("min(lbl)")}),
                          batch_format="pyarrow").materialize())
        # convergence: any row whose label shrank this round?
        joined = new_labels.join(
            labels.map_batches(lambda t: pa.table(
                {"node2": t.column("node"), "old": t.column("lbl")}),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=nparts,
            on=("node",), right_on=("node2",))
        changed = joined.map_batches(
            lambda t: pa.table({"n": pa.array(
                [int(pc.sum(pc.cast(pc.not_equal(
                    t.column("lbl"), t.column("old")),
                    pa.int64())).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow")
        n_changed = sum(r["n"] for r in changed.take_all())
        labels = new_labels
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # wrong-but-silent labels are worse than a loud failure
        raise RuntimeError(
            f"link_components: min-label propagation did not converge "
            f"in {COMPONENT_MAX_ITERS} rounds")

    out = labels.to_pandas().sort_values("node")
    return pa.table({"node": pa.array(out["node"].to_numpy(), pa.int64()),
                     "component": pa.array(out["lbl"].to_numpy(),
                                           pa.int64())})
