"""Link-graph / title extraction over the planted pages corpus."""
import numpy as np
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.config import PipelineConfig
from text_extraction_system_ray.functions.html_extract import (
    extract_html, parse_html_blocks)
from text_extraction_system_ray.pipelines.links import (
    _INTERNAL_RE, _scan_batch, title_of_payload)
from text_extraction_system_ray.sources.pages import (
    doc_to_page_html, synth_pages)

SF = "/root/testdata/sf0.001"


def _docs():
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"]).to_pylist()


def test_title_fast_path_matches_block_parser():
    """The regex title fast path must equal the frozen parser's H7
    capture on every corpus page, including entity / whitespace cases."""
    cfg = PipelineConfig()
    total = len(_docs())
    for d in _docs():
        payload = doc_to_page_html(d["doc_id"], d["text"] or "",
                                   d["source"], total=total)
        _, title, _ = parse_html_blocks(
            payload.decode("utf-8"), cfg)
        assert title_of_payload(payload) == title, d["doc_id"]
    # synthetic edge cases
    for html, want in [
        (b"<html><head><title> A &amp;\n B </title></head></html>", "A & B"),
        (b"<html><head><title></title></head><body>x</body></html>", None),
        (b"<html><body>no title</body></html>", None),
    ]:
        _, title, _ = parse_html_blocks(html.decode(), cfg)
        assert title_of_payload(html) == title == want


def test_planted_links_are_boilerplate_stripped():
    """The related-links nav must NOT leak into the extracted text (the
    byte-identity extraction contract predates the plant)."""
    cfg = PipelineConfig()
    docs = _docs()
    total = len(docs)
    for d in docs[:40]:
        without = doc_to_page_html(d["doc_id"], d["text"] or "", d["source"])
        with_links = doc_to_page_html(d["doc_id"], d["text"] or "",
                                      d["source"], total=total)
        if d["doc_id"] % 53 == 11 or d["doc_id"] % 41 == 7:
            continue
        kb0, t0, tb0 = extract_html(without, cfg)
        kb1, t1, tb1 = extract_html(with_links, cfg)
        assert [b.text for b in kb0] == [b.text for b in kb1], d["doc_id"]
        assert t0 == t1
        assert len(tb0) == len(tb1)


def test_scan_batch_counts():
    import pyarrow as pa
    total = 100
    payload = doc_to_page_html(13, "w1 w2 w3 w4", "web", total=total)
    t = pa.table({"url": ["https://example.org/web/00000013"],
                  "html": [payload]})
    s = _scan_batch(t)
    assert s["n_int"][0] == 1 + 13 % 5
    assert s["n_ext"][0] == 7   # 6 boilerplate anchors + canonical link
    want = sorted((13 * 31 + 97 * j) % total for j in range(1, 2 + 13 % 5))
    assert sorted(s["targets"].tolist()) == want


def test_internal_href_regex_strict():
    assert _INTERNAL_RE.match(b"/doc/00000042")
    assert not _INTERNAL_RE.match(b"/doc/42")
    assert not _INTERNAL_RE.match(b"/docs/00000042")
    assert not _INTERNAL_RE.match(b"/doc/00000042#frag")


def test_jsonld_of_payload():
    from text_extraction_system_ray.pipelines.links import jsonld_of_payload
    p = doc_to_page_html(12, "w1 w2 w3", "web", total=50, n_chars=8)
    obj = jsonld_of_payload(p)
    assert obj == {"@type": "Article", "headline": "Doc 12",
                   "charCount": 8, "publisher": "web"}
    # absent / malformed blocks
    assert jsonld_of_payload(b"<html><body>x</body></html>") is None
    assert jsonld_of_payload(
        b'<html><script type="application/ld+json">{broken'
        b"</script></html>") is None


def test_title_fast_path_malformed_cases():
    from text_extraction_system_ray.pipelines.links import title_of_payload
    from text_extraction_system_ray.functions.html_extract import parse_html_blocks
    cfg = PipelineConfig()
    cases = [
        b"<html><title>x</title ></html>",             # spaced close tag
        b"<html><title>never closed",                  # EOF recovery
        b"<html><title>a</title><title>b</title>",     # multiple titles
        b"<html><title/>after</html>",                 # self-closing
        b"<html><TITLE>Upper &amp; case</TITLE></html>",
        b"<html><title>  sp\n\naced  </title></html>",
    ]
    for payload in cases:
        _, want, _ = parse_html_blocks(payload.decode("utf-8"), cfg)
        assert title_of_payload(payload) == want, payload


def test_title_fast_path_fuzz_parity():
    """Property: the regex fast path equals the frozen parser's title on
    random markup soup (the pin behind html_title_extract)."""
    import random
    from text_extraction_system_ray.pipelines.links import title_of_payload
    from text_extraction_system_ray.functions.html_extract import parse_html_blocks
    cfg = PipelineConfig()
    rng = random.Random(42)
    atoms = ["<title>", "</title>", "</title >", "<title/>", "<TITLE >",
             "text", "&amp;", "<p>", "</p>", " ", "\n", "<b>", "&#65;",
             "<script>", "</script>", "x</", ">y", "\x01", "€"]
    for i in range(300):
        soup = "".join(rng.choice(atoms) for _ in range(rng.randint(1, 30)))
        payload = soup.encode("utf-8")
        _, want, _ = parse_html_blocks(soup, cfg)
        got = title_of_payload(payload)
        assert got == want, repr(soup)


def test_scan_batch_resolves_relative_hrefs():
    """RFC 3986 resolution in the scanner: relative and absolute
    spellings of an internal link classify identically."""
    import pyarrow as pa
    from text_extraction_system_ray.pipelines.links import _scan_batch
    html = (b'<html><body>'
            b'<a href="../doc/00000005">rel</a>'
            b'<a href="https://example.org/doc/00000006">abs</a>'
            b'<a href="/doc/00000007">pathabs</a>'
            b'<a href="https://other.org/doc/00000008">foreign</a>'
            b'<a href="nested/page">plain-rel</a>'
            b"</body></html>")
    t = pa.table({"url": ["https://example.org/web/00000001"],
                  "html": [html]})
    s = _scan_batch(t)
    assert s["n_int"][0] == 3
    assert sorted(s["targets"].tolist()) == [5, 6, 7]
    assert s["n_ext"][0] == 2


def test_base_href_overrides_resolution_base():
    import pyarrow as pa
    from text_extraction_system_ray.pipelines.links import _scan_batch
    html = (b'<html><head><base href="https://example.org/doc/"></head>'
            b'<body><a href="00000009">rel-to-base</a>'
            b'<a href="../web/x">up</a></body></html>')
    t = pa.table({"url": ["https://example.org/web/00000001"],
                  "html": [html]})
    s = _scan_batch(t)
    # "00000009" resolves against the <base>, not the page URL; the
    # base tag's own href is not counted as a link
    assert s["n_int"][0] == 1 and s["targets"].tolist() == [9]
    assert s["n_ext"][0] == 1


# ------------------------------------------------------- link_triangles

def test_link_triangles_plans_pinned_equal(ray_session, monkeypatch):
    """The guarded driver finish, the distributed two-join plan and its
    hot-middle-node broadcast path must all return the same
    (n_edges, n_triangles) on the planted corpus — the same
    monkeypatch-the-guard pattern as test_dedup_scale_paths."""
    from text_extraction_system_ray.pipelines import links

    base = links.link_triangles(SF).to_pandas()
    assert base.loc[0, "n_edges"] > 0

    monkeypatch.setattr(links, "TRIANGLE_DRIVER_EDGE_LIMIT", 0)
    dist = links.link_triangles(SF).to_pandas()
    assert base.equals(dist)

    monkeypatch.setattr(links, "TRIANGLE_WEDGE_CAP", 0)
    allhot = links.link_triangles(SF).to_pandas()
    assert base.equals(allhot)

    monkeypatch.setattr(links, "TRIANGLE_WEDGE_CAP", 30)
    mixed = links.link_triangles(SF).to_pandas()
    assert base.equals(mixed)


def test_link_triangles_driver_kernel_small_graph(ray_session):
    """Hand-checkable 5-node graph: edges form exactly two transitive
    triangles (1→2→3, 1→3) and (2→3→4, 2→4); the hub-limit guard defers
    to the distributed plan when the wedge total exceeds it."""
    import pyarrow as pa
    import ray.data as rd
    from text_extraction_system_ray.pipelines import links

    edges = pa.table({
        "src": pa.array([1, 2, 1, 3, 2, 4, 5], pa.int64()),
        "dst": pa.array([2, 3, 3, 4, 4, 5, 1], pa.int64())})
    raw = rd.from_arrow(edges).materialize()
    out = links._driver_triangles(raw).to_pandas()
    assert out.loc[0, "n_edges"] == 7
    assert out.loc[0, "n_triangles"] == 2
    # wedge-limit guard: kernel declines, caller falls to distributed
    old = links.TRIANGLE_DRIVER_WEDGE_LIMIT
    try:
        links.TRIANGLE_DRIVER_WEDGE_LIMIT = 0
        assert links._driver_triangles(raw) is None
    finally:
        links.TRIANGLE_DRIVER_WEDGE_LIMIT = old


def test_link_components_plans_pinned_equal(ray_session, monkeypatch):
    """Driver union-find and the distributed min-label-propagation plan
    must produce identical (node, component) labelings."""
    from text_extraction_system_ray.pipelines import links

    base = links.link_components(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert len(base) > 0
    # canonical labels: every component id is a member of itself
    comps = set(base["component"])
    nodes = set(base["node"])
    assert comps <= nodes
    monkeypatch.setattr(links, "COMPONENT_DRIVER_EDGE_LIMIT", 0)
    dist = links.link_components(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert base.equals(dist)


def test_driver_components_small_graph(ray_session):
    """Hand-checkable: two components {1,2,3} and {7,8}, canonical
    labels are the component minima."""
    import pyarrow as pa
    import ray.data as rd
    from text_extraction_system_ray.pipelines import links

    edges = pa.table({"src": pa.array([1, 2, 7], pa.int64()),
                      "dst": pa.array([2, 3, 8], pa.int64())})
    out = links._driver_components(rd.from_arrow(edges).materialize()) \
        .to_pandas().set_index("node")["component"].to_dict()
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_distributed_components_long_chain_converges(ray_session):
    """A 300-node path graph has diameter 299 — far beyond the 64-round
    cap — so this only passes because label links feed back as shortcut
    edges (pointer jumping, O(log diameter) rounds)."""
    import pyarrow as pa
    import ray.data as rd
    from text_extraction_system_ray.pipelines import links

    n = 300
    edges = pa.table({
        "src": pa.array(list(range(n - 1)), pa.int64()),
        "dst": pa.array(list(range(1, n)), pa.int64())})
    out = links._distributed_components(
        rd.from_arrow(edges).materialize()).to_pandas()
    assert len(out) == n
    assert (out["component"] == 0).all()
