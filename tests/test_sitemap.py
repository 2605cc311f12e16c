"""Sitemap protocol build/parse round-trip + index walk."""
import datetime as dt

from text_extraction_system_ray.sources.sitemap import (
    build_sitemap, build_sitemap_index, parse_sitemap, parse_sitemap_index)


def test_urlset_roundtrip_gz():
    blob = build_sitemap("web", [3, 1, 400])
    assert blob[:2] == b"\x1f\x8b"
    got = parse_sitemap(blob)
    assert [u for u, _ in got] == [
        "https://example.org/web/00000001",
        "https://example.org/web/00000003",
        "https://example.org/web/00000400",
    ]
    assert got[0][1] == dt.date(2021, 1, 2)          # 1 % 365 = 1 day
    assert got[2][1] == dt.date(2021, 1, 1) + dt.timedelta(days=400 % 365)


def test_urlset_plain_and_missing_lastmod():
    xml = (b"<urlset><url><loc> https://e.org/a </loc></url>"
           b"<url><lastmod>2021-02-03</lastmod></url>"          # no loc: skip
           b"<url><loc>https://e.org/b</loc>"
           b"<lastmod>2021-02-03</lastmod></url></urlset>")
    got = parse_sitemap(xml)
    assert got == [("https://e.org/a", None),
                   ("https://e.org/b", dt.date(2021, 2, 3))]


def test_index_walk():
    idx = build_sitemap_index(["web", "books"])
    locs = parse_sitemap_index(idx)
    assert locs == ["https://example.org/sitemap-books.xml.gz",
                    "https://example.org/sitemap-web.xml.gz"]
    assert parse_sitemap_index(b"<sitemapindex></sitemapindex>") == []
