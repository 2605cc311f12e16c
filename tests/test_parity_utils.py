"""Unit tests: coord↔text mapping, rotation math, serialization codecs,
PDF table detection, small utils. Style mirrors the reference's pure-
function golden tests (``test_data_extract.py:74-161``,
``test_rotation_detection.py:11-60``)."""
import json

import numpy as np
import pytest

from text_extraction_system_ray.config import DEFAULT_CONFIG as CFG
from text_extraction_system_ray.extract import extract_row
from text_extraction_system_ray.functions.coord_map import (
    area_to_text_span, find_closest_char, find_page_by_char_index,
    span_to_line_rects)
from text_extraction_system_ray.functions.pdf_build import build_pdf
from text_extraction_system_ray.functions.pdf_extract import extract_pdf
from text_extraction_system_ray.functions.pdf_tables import detect_pdf_tables
from text_extraction_system_ray.functions.rotation import (
    cluster_angles, normalize_angle_90, osd_accept, shift_trend_vote,
    weighted_average_angle, detect_rotation_raster)
from text_extraction_system_ray.functions.serialize import encode_structure
from text_extraction_system_ray.functions.textutils import (
    LanguageConverter, get_valid_fn)


# ---------------------------------------------------------------- coord map
def _pdf_doc():
    pdf = build_pdf([["Hello world", "Second line"], ["Page two"]])
    return extract_row("u", pdf)


def test_find_page_binary_and_linear():
    r = _pdf_doc()
    assert find_page_by_char_index(r["pages"], 0) == 1
    assert find_page_by_char_index(r["pages"], r["pages"][1]["start"]) == 2
    assert find_page_by_char_index(r["pages"], 10_000) is None
    # binary-search branch (>= 10 pages)
    pages = [{"number": i + 1, "start": i * 10, "end": (i + 1) * 10}
             for i in range(25)]
    assert find_page_by_char_index(pages, 137) == 14
    assert find_page_by_char_index(pages, 0) == 1
    assert find_page_by_char_index(pages, 249) == 25


def test_find_closest_char():
    r = _pdf_doc()
    spans = r["char_spans"]
    # first char box starts at x=72, y=720
    idx = find_closest_char(spans, 73.0, 721.0)
    assert r["text"][idx] == "H"
    # far off to the right of the first line → last char of that line
    idx2 = find_closest_char(spans, 500.0, 720.0)
    assert r["text"][idx2] == "d"


def test_area_to_text_span():
    r = _pdf_doc()
    # area covering the word "world" (chars 6-10 of line 1, x = 72+6*6=108)
    span = area_to_text_span(r["char_spans"], (107.0, 719.0, 31.0, 14.0))
    assert span is not None
    s, e = span
    assert r["text"][s:e] == "world"


def test_span_to_line_rects():
    r = _pdf_doc()
    # both lines of page 1 ("Hello world\nSecond line")
    rects = span_to_line_rects(r["char_spans"], 0, 23)
    assert len(rects) == 2
    assert rects[0][0] == 72.0


# ----------------------------------------------------------------- rotation
def test_normalize_angle_90():
    # ref golden table (data_extract.py:365-374 analog)
    assert normalize_angle_90(0.0) == 0.0
    assert normalize_angle_90(44.0) == 44.0
    assert normalize_angle_90(46.0) == -44.0
    assert normalize_angle_90(90.0) == 0.0
    assert normalize_angle_90(-93.0) == -3.0
    assert normalize_angle_90(359.0) == -1.0


def test_weighted_average_trim():
    # outliers in the 10% tails are trimmed
    angles = [0.0] * 19 + [50.0]
    weights = [1.0] * 20
    assert abs(weighted_average_angle(angles, weights)) < 1.0
    assert weighted_average_angle([], []) == 0.0


def test_cluster_angles_mode_and_gate():
    a = [0.1, 0.2, 0.15, 30.0]
    w = [10, 10, 10, 1]
    mean, ok = cluster_angles(a, w)
    assert abs(mean - 0.15) < 0.05
    assert ok
    # wildly spread cluster fails the deviation gate
    mean2, ok2 = cluster_angles([0, 2.9, 1.5], [1, 1, 1], merge_deg=3.0)
    assert not ok2


def test_shift_trend_vote():
    n = 60
    right = np.zeros((n, 4)); right[:, 0] = np.arange(n); right[:, 2:] = 1
    assert shift_trend_vote(right) == 0
    up = np.zeros((n, 4)); up[:, 1] = np.arange(n); up[:, 2:] = 1
    assert shift_trend_vote(up) == 90
    down = np.zeros((n, 4)); down[:, 1] = -np.arange(n); down[:, 2:] = 1
    assert shift_trend_vote(down) == -90
    left = np.zeros((n, 4)); left[:, 0] = -np.arange(n); left[:, 2:] = 1
    assert shift_trend_vote(left) == 180
    assert shift_trend_vote(right[:10]) == 0   # under min_samples


def test_osd_accept():
    assert osd_accept(1.5, 3.5)
    assert not osd_accept(0.5, 10.0)
    assert not osd_accept(5.0, 3.0)


def test_raster_detection_stubbed():
    with pytest.raises(NotImplementedError):
        detect_rotation_raster(b"")


# ------------------------------------------------------------ serialization
def test_encode_structure_json_msgpack():
    r = extract_row("u", b"<p>Hello serialization test one.</p>")
    struct = {"title": r["title"], "language": r["language"],
              "pages": r["pages"], "sentences": r["sentences"],
              "paragraphs": r["paragraphs"], "sections": r["sections"],
              "table_of_contents": r["toc"]}
    j = encode_structure(struct, "json")
    assert json.loads(j)["language"] == r["language"]
    import msgpack
    m = encode_structure(struct, "msgpack")
    assert msgpack.unpackb(m, raw=False)["language"] == r["language"]
    # ref invariant analog: json > msgpack for the same structure
    assert len(j) > len(m)
    # ref invariant analog: protobuf smaller than msgpack (test_data_
    # extract.py:165-205 size ordering json > msgpack > protobuf)
    p = encode_structure(struct, "protobuf")
    assert 0 < len(p) < len(m)


def test_protobuf_structure_roundtrip():
    """Hand-rolled proto2 wire codec vs the reference contract
    (contract_pages.proto): every field round-trips through the
    decoder, and a tiny message matches hand-computed wire bytes."""
    from text_extraction_system_ray.functions.serialize import (
        decode_message, decode_packed_floats, decode_string_value,
        encode_char_bboxes_protobuf, encode_structure_protobuf)
    struct = {
        "title": "Doc Title", "language": "en",
        "pages": [{"number": 1, "start": 0, "end": 42,
                   "rotation": 2.5, "bbox": [0.0, 0.0, 612.0, 792.0]}],
        "sentences": [{"start": 0, "end": 10, "language": "en"}],
        "paragraphs": [{"start": 0, "end": 42, "language": ""}],
        "sections": [{"start": 0, "end": 42, "title": "Intro",
                      "title_start": 0, "title_end": 5, "level": 1,
                      "abs_level": 1, "left": 72.0, "top": 700.25,
                      "page": 1}],
        "table_of_contents": [{"title": "Intro", "level": 1,
                               "left": 72, "top": 700, "page": 1}],
    }
    blob = encode_structure_protobuf(struct)
    m = decode_message(blob)
    assert decode_string_value(m[1][0]) == "Doc Title"
    assert decode_string_value(m[2][0]) == "en"
    page = decode_message(m[3][0])
    assert page[1][0] == 1 and page[2][0] == 0 and page[3][0] == 42
    assert abs(page[4][0] - 2.5) < 1e-6
    assert decode_packed_floats(page[5][0]) == [0.0, 0.0, 612.0, 792.0]
    sent = decode_message(m[4][0])
    assert (sent[1][0], sent[2][0]) == (0, 10)
    assert decode_string_value(sent[3][0]) == "en"
    para = decode_message(m[5][0])
    assert decode_string_value(para[3][0]) == ""     # present-but-empty
    sect = decode_message(m[6][0])
    assert decode_string_value(sect[3][0]) == "Intro"
    assert sect[10][0] == 1 and abs(sect[9][0] - 700.25) < 1e-4
    toc = decode_message(m[7][0])
    assert toc[3][0] == 72 and toc[5][0] == 1        # int32 left per proto
    # hand-computed golden: Page{number=1,start=0,end=3} =
    # key(1,varint)=0x08 val 1; key(2)=0x10 val 0; key(3)=0x18 val 3
    tiny = encode_structure_protobuf(
        {"pages": [{"number": 1, "start": 0, "end": 3}]})
    assert tiny == bytes([0x1A, 0x06, 0x08, 0x01, 0x10, 0x00, 0x18, 0x03])
    # CharBboxes: one Coordinates submessage per char, packed floats
    cb = encode_char_bboxes_protobuf([[1.0, 2.0, 3.0, 4.0]])
    outer = decode_message(cb)
    inner = decode_message(outer[1][0])
    assert decode_packed_floats(inner[1][0]) == [1.0, 2.0, 3.0, 4.0]
    # varint multi-byte check: end=300 → 0xAC 0x02
    big = encode_structure_protobuf(
        {"pages": [{"number": 1, "start": 0, "end": 300}]})
    assert big.endswith(bytes([0x18, 0xAC, 0x02]))


# -------------------------------------------------------------- pdf tables
def _table_pdf():
    # 3 rows x 3 aligned columns at x = 72, 200, 328
    rows = []
    values = [["name", "qty", "price"], ["apple", "12", "3.50"],
              ["pear", "7", "2.25"]]
    content = []
    y = 700
    for row in values:
        for j, cell in enumerate(row):
            content.append(f"BT /F1 12 Tf {72 + j * 128} {y} Td ({cell}) Tj ET")
        y -= 20
    return build_pdf([[]], raw_contents=[" ".join(content).encode()])


def test_pdf_table_detected():
    pdf = _table_pdf()
    pages = extract_pdf(pdf, CFG)
    tables = detect_pdf_tables(pages[0], 1)
    assert len(tables) == 1
    t = tables[0]
    assert t["cells"] == [["name", "qty", "price"],
                          ["apple", "12", "3.50"],
                          ["pear", "7", "2.25"]]
    assert t["page"] == 1 and t["left"] == 72.0


def test_pdf_table_in_extract_row():
    r = extract_row("u", _table_pdf())
    assert len(r["tables"]) == 1
    assert r["tables"][0]["cells"][1][0] == "apple"
    # plain text still contains the cell text
    assert "apple" in r["text"]


def test_no_table_on_plain_pages():
    r = extract_row("u", build_pdf([["just one line", "and another"]]))
    assert r["tables"] == []


# -------------------------------------------------------------------- utils
def test_get_valid_fn():
    assert get_valid_fn("a/b\\c:d.txt") == "a_b_c_d.txt"
    long = "x" * 100 + ".pdf"
    out = get_valid_fn(long)
    assert out.endswith(".pdf") and len(out) <= 64 + 5
    assert get_valid_fn("***") == "_"


def test_language_converter():
    assert LanguageConverter.get_language_and_locale_code("en_US") == ("en", "US")
    assert LanguageConverter.get_language_and_locale_code("de") == ("de", "")
    assert LanguageConverter.convert_language_to_tesseract_view("en_US") == "eng"
    assert LanguageConverter.convert_language_to_tesseract_view("zz") == "osd"
