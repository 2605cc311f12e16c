"""WARC container source: byte-exact round-trip + member independence."""
import datetime as dt

import pyarrow as pa
import pytest

from text_extraction_system_ray.sources.warc import (
    _gzip_member, build_record, parse_warc, read_warc, write_warc)

SF = "/root/testdata/sf0.001"


def test_record_roundtrip_binary_payloads():
    rows = [
        ("https://example.org/web/00000001", dt.datetime(2021, 1, 1, 0, 0, 1),
         b"<html><body>hi</body></html>"),
        # binary payload with CRLFs, NULs and a fake WARC/ header inside
        ("https://example.org/pdf/00000002", dt.datetime(2021, 1, 1, 0, 0, 2),
         b"%PDF-1.4\r\n\r\nWARC/1.0\r\n\x00\xff binary \r\n\r\n%%EOF"),
        ("https://example.org/web/00000003", dt.datetime(2021, 1, 1, 0, 0, 3),
         b""),
    ]
    blob = b"".join(_gzip_member(build_record(u, ts, p)) for u, ts, p in rows)
    t = parse_warc(blob)
    assert t.num_rows == 3
    assert t.column("url").to_pylist() == [r[0] for r in rows]
    assert t.column("warc_ts").to_pylist() == [r[1] for r in rows]
    assert t.column("html").to_pylist() == [r[2] for r in rows]


def test_member_boundary_resume():
    """Each record is its own gzip member: parsing a suffix of the shard
    (starting at any member boundary) yields exactly the tail records —
    the property Common-Crawl range requests rely on."""
    members = [_gzip_member(build_record(f"https://e.org/w/{i:08d}",
                                         dt.datetime(2021, 1, 1), b"x" * i))
               for i in range(4)]
    tail = parse_warc(b"".join(members[2:]))
    assert tail.num_rows == 2
    assert tail.column("html").to_pylist() == [b"xx", b"xxx"]


def test_uncompressed_warc_accepted():
    raw = build_record("u1", dt.datetime(2021, 1, 1), b"abc") + \
        build_record("u2", dt.datetime(2021, 1, 2), b"defg")
    t = parse_warc(raw)
    assert t.column("html").to_pylist() == [b"abc", b"defg"]


def test_pages_roundtrip_through_warc(ray_session, tmp_path):
    """synth pages → shards → read_warc == original (url, warc_ts, html)."""
    from text_extraction_system_ray.sources.pages import synth_pages

    orig = {r["url"]: (r["warc_ts"], r["html"])
            for r in synth_pages(SF).take_all()}
    paths = write_warc(synth_pages(SF), str(tmp_path / "warc"))
    assert paths and all(p.endswith(".warc.gz") for p in paths)
    back = read_warc(paths).take_all()
    assert len(back) == len(orig)
    for r in back:
        ts, payload = orig[r["url"]]
        assert r["warc_ts"] == ts, r["url"]
        assert r["html"] == (payload or b""), r["url"]


def test_truncated_trailing_member_keeps_complete_records():
    members = [_gzip_member(build_record(f"https://e.org/w/{i:08d}",
                                         dt.datetime(2021, 1, 1),
                                         b"ok" * (50 * i)))
               for i in range(3)]
    # chop deep into the last member's DATA (not just the gzip trailer):
    # its record body is incomplete and must be dropped, the two
    # complete members before it survive
    blob = b"".join(members[:2]) + members[2][:len(members[2]) // 2]
    t = parse_warc(blob)
    assert t.num_rows == 2
    assert t.column("html").to_pylist() == [b"", b"ok" * 50]


def test_garbage_after_valid_members():
    blob = _gzip_member(build_record("u", dt.datetime(2021, 1, 1), b"x")) + \
        b"\x1f\x8bgarbage-not-gzip"
    t = parse_warc(blob)
    assert t.num_rows == 1 and t.column("html").to_pylist() == [b"x"]


def test_truncated_warc_header_ignored():
    raw = build_record("u", dt.datetime(2021, 1, 1), b"x") + \
        b"WARC/1.0\r\nWARC-Type: resp"     # header never terminates
    t = parse_warc(raw)
    assert t.num_rows == 1


def test_junk_header_values_tolerated():
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Date: not-a-date\r\nWARC-Target-URI: u\r\n"
           b"Content-Length: 7\r\n\r\nHTTP!!!"
           + build_record("v", dt.datetime(2021, 1, 2), b"ok"))
    t = parse_warc(raw)
    assert t.num_rows == 2
    assert t.column("warc_ts").to_pylist()[0] == dt.datetime(1970, 1, 1)
    assert t.column("http_status").to_pylist() == [0, 200]
    # junk Content-Length skips only that record
    raw2 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: banana\r\n\r\n"
            + build_record("w", dt.datetime(2021, 1, 3), b"z"))
    t2 = parse_warc(raw2)
    assert t2.column("url").to_pylist() == ["w"]


def test_negative_content_length_no_hang():
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: -54\r\n\r\n"
           + build_record("ok", dt.datetime(2021, 1, 1), b"x"))
    t = parse_warc(raw)          # must terminate
    assert t.column("url").to_pylist() == ["ok"]


def test_write_warc_arbitrary_urls(ray_session, tmp_path):
    """Shard naming must be total over URLs (no 8-digit-tail assumption)."""
    import ray.data
    ds = ray.data.from_items([
        {"url": "https://example.org/", "warc_ts": dt.datetime(2021, 1, 1),
         "html": b"<html>root</html>"},
        {"url": "https://example.org/a?q=1", "warc_ts": dt.datetime(2021, 1, 2),
         "html": b"<html>a</html>"},
    ])
    paths = write_warc(ds, str(tmp_path / "w"))
    back = read_warc(paths).take_all()
    assert sorted(r["url"] for r in back) == \
        ["https://example.org/", "https://example.org/a?q=1"]
