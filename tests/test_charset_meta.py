"""Charset sniffing and head-metadata extraction edge cases."""
import pytest

from text_extraction_system_ray.functions.charset import (
    decode_payload, sniff_charset)
from text_extraction_system_ray.pipelines.charset import (
    body_text, build_payload)
from text_extraction_system_ray.pipelines.links import meta_of_payload


def test_bom_beats_lying_meta():
    # utf-16 payloads declare charset=utf-8 in their meta — BOM must win
    p = build_payload(1, "web")          # utf-16-le family
    assert sniff_charset(p) == ("utf-16-le", 2)
    text, codec = decode_payload(p)
    assert codec == "utf-16-le"
    assert body_text(1, "web") in text

    p = build_payload(2, "web")          # utf-16-be family
    text, codec = decode_payload(p)
    assert codec == "utf-16-be"
    assert "€" in text


def test_meta_prescan_labels():
    cases = [
        (b'<html><head><meta charset="windows-1252"></head></html>', "cp1252"),
        (b'<html><head><meta charset=UTF-8></head></html>', "utf-8"),
        (b"<html><head><meta http-equiv='Content-Type' "
         b"content='text/html; charset=iso-8859-1'></head></html>", "cp1252"),
        (b"<html><head></head><body>plain</body></html>", "utf-8"),
    ]
    for payload, want in cases:
        assert sniff_charset(payload)[0] == want, payload


def test_meta_outside_prescan_window_ignored():
    pad = b"<!--" + b"x" * 1100 + b"-->"
    p = b"<html>" + pad + b'<meta charset="windows-1252">' + b"</html>"
    assert sniff_charset(p)[0] == "utf-8"


def test_cp1252_euro_byte():
    p = build_payload(3, "books")        # cp1252 family
    text, codec = decode_payload(p)
    assert codec == "cp1252"
    assert text.endswith("€</body></html>")
    assert b"\x80" in p                  # the classic mojibake byte


def test_malformed_utf8_replaces_not_raises():
    text, codec = decode_payload(b"<html>\xff\xfa broken</html>")
    assert codec == "utf-8"
    assert "�" in text


def test_meta_of_payload_attr_order_and_quotes():
    p = (b'<html><head>'
         b"<link href='https://e.org/c' rel='canonical'>"
         b'<meta content="first desc" name="description">'
         b'<meta name="description" content="second (ignored)">'
         b'</head></html>')
    m = meta_of_payload(p)
    assert m["description"] == "first desc"
    assert m["canonical"] == "https://e.org/c"


def test_meta_of_payload_absent():
    m = meta_of_payload(b"<html><body>no head metadata</body></html>")
    assert m == {"description": None, "canonical": None}
