"""Office-document intake (docx/odt/xlsx/ods → PDF → extraction) —
M1's office branch, reference ``pdf/convert_to_pdf.py:61-102``."""
import pytest

from text_extraction_system_ray.config import PipelineConfig
from text_extraction_system_ray.extract import extract_row, sniff_kind
from text_extraction_system_ray.functions.office import (
    build_docx, build_odt, build_xlsx, docx_paragraphs, odt_paragraphs,
    office_to_pdf, ods_rows, sniff_office, xlsx_rows)


def test_sniff_office_formats():
    assert sniff_office(build_docx([(0, "x")])) == "docx"
    assert sniff_office(build_odt([(0, "x")])) == "odt"
    assert sniff_office(build_xlsx([["x"]])) == "xlsx"
    assert sniff_office(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 64) \
        == "doc"
    assert sniff_office(b"PK\x03\x04randomzip") is None
    assert sniff_office(b"<html></html>") is None
    for payload in (build_docx([(0, "x")]), build_odt([(0, "x")]),
                    build_xlsx([["x"]])):
        assert sniff_kind(payload) == "office"


def test_docx_roundtrip_paragraphs_headings_tables():
    paras = [(1, "Quarterly Report"),
             (0, "First paragraph with several words."),
             (2, "Details"),
             (0, "Tabbed\tcontent here")]
    payload = build_docx(paras, tables=[[["a1", "b1"], ["a2", "b2"]]])
    got = docx_paragraphs(payload)
    assert got[:4] == paras
    assert got[4:] == [(0, "a1\tb1"), (0, "a2\tb2")]


def test_odt_roundtrip():
    paras = [(1, "ODT Title"), (0, "Body text."), (0, "Tab\there")]
    assert odt_paragraphs(build_odt(paras)) == paras


def test_xlsx_shared_strings_and_numbers():
    rows = [["name", "qty"], ["apples", 31], ["apples", 7.5]]
    got = xlsx_rows(build_xlsx(rows))
    assert got == [["name", "qty"], ["apples", "31"], ["apples", "7.5"]]


def test_extract_row_docx_text_toc_and_kind():
    payload = build_docx([(1, "Doc 7 office"),
                          (0, "alpha beta gamma " * 30)])
    row = extract_row("https://example.org/off/00000007", payload)
    assert row["status"] == "ok" and row["kind"] == "office"
    assert row["text"].startswith("Doc 7 office\n")
    assert row["text"].split() == ["Doc", "7", "office"] \
        + ["alpha", "beta", "gamma"] * 30
    assert [t["title"] for t in row["toc"]] == ["Doc 7 office"]
    # span contract holds through the converted path
    assert len(row["char_spans"]) == len(row["text"])


def test_extract_row_multi_page_and_heading_pages():
    # enough text for >1 page (30 lines/page at 60-col wrap)
    paras = [(1, "Start")] + [(0, f"paragraph {i} " + "word " * 20)
                              for i in range(40)] + [(1, "End")]
    row = extract_row("u", build_docx(paras))
    assert row["status"] == "ok"
    assert len(row["pages"]) > 1
    toc = row["toc"]
    assert [t["title"] for t in toc] == ["Start", "End"]
    assert toc[0]["page"] == 1 and toc[1]["page"] == len(row["pages"])


def test_legacy_doc_errors_cleanly():
    row = extract_row("u", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 99)
    assert row["status"] == "error" and row["kind"] == "office"
    assert ".docx" in row["error"]


def test_corrupt_zip_errors_cleanly():
    payload = build_docx([(0, "hello")])[:-20]  # truncated archive
    row = extract_row("u", payload)
    assert row["status"] == "error"


def test_ods_rows_with_repeats():
    # hand-built minimal ods
    import io
    import zipfile
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:spreadsheet><table:table>"
        "<table:table-row>"
        "<table:table-cell><text:p>a</text:p></table:table-cell>"
        '<table:table-cell table:number-columns-repeated="2">'
        "<text:p>b</text:p></table:table-cell>"
        "</table:table-row>"
        "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("mimetype"),
                   "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", content)
    payload = buf.getvalue()
    assert sniff_office(payload) == "ods"
    assert ods_rows(payload) == [["a", "b", "b"]]
    assert extract_row("u", payload)["text"].split() == ["a", "b", "b"]


def test_office_pdf_parses_with_default_config():
    pdf = office_to_pdf(build_docx([(0, "two words")]))
    assert pdf.startswith(b"%PDF")
    from text_extraction_system_ray.functions.pdf_extract import (
        extract_pdf)
    pages = extract_pdf(pdf, PipelineConfig())
    text = "".join(c.ch for p in pages for b in p.blocks
                   for ln in b.lines for c in ln)
    assert text == "two words"


def test_office_fuzz_never_raises():
    """Malformed office-shaped payloads become error rows (or parse to
    whatever is recoverable) — never exceptions out of extract_row."""
    from hypothesis import given, settings, strategies as st

    docx = build_docx([(1, "H"), (0, "body words here")])

    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=0, max_value=len(docx) - 1),
           st.binary(min_size=1, max_size=8))
    def mutate(pos, junk):
        payload = docx[:pos] + junk + docx[pos + len(junk):]
        row = extract_row("u", payload)
        assert row["status"] in ("ok", "error")
        assert isinstance(row["text"], str)

    mutate()


def test_office_xml_bomb_is_bounded():
    # deeply nested XML must not blow the stack or hang
    import io
    import zipfile
    evil = ("<w:p>" * 2000) + ("</w:p>" * 2000)
    doc = ('<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
           'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
           + evil + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    row = extract_row("u", buf.getvalue())
    assert row["status"] in ("ok", "error")


def test_odt_tables_flatten_like_docx():
    import io
    import zipfile
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:text>"
        "<text:p>before</text:p>"
        "<table:table>"
        "<table:table-row>"
        "<table:table-cell><text:p>a1</text:p></table:table-cell>"
        "<table:table-cell><text:p>b1</text:p></table:table-cell>"
        "</table:table-row>"
        "<table:table-row>"
        "<table:table-cell><text:p>a2</text:p></table:table-cell>"
        "<table:table-cell><text:p>b2</text:p></table:table-cell>"
        "</table:table-row>"
        "</table:table>"
        "<text:p>after</text:p>"
        "</office:text></office:body></office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("mimetype"),
                   "application/vnd.oasis.opendocument.text")
        z.writestr("content.xml", content)
    assert odt_paragraphs(buf.getvalue()) == [
        (0, "before"), (0, "a1\tb1"), (0, "a2\tb2"), (0, "after")]


def test_xlsx_sheets_in_numeric_order():
    import io
    import zipfile
    def sheet(val):
        return ('<?xml version="1.0"?><worksheet xmlns="http://schemas.'
                'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
                f'<row r="1"><c r="A1"><v>{val}</v></c></row>'
                "</sheetData></worksheet>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", "<workbook/>")
        for i in (1, 2, 10, 11):
            z.writestr(f"xl/worksheets/sheet{i}.xml", sheet(i))
    assert [r[0] for r in xlsx_rows(buf.getvalue())] \
        == ["1", "2", "10", "11"]
