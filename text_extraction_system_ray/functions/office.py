"""Office-document intake: docx / odt / xlsx / ods → PDF → extraction.

The reference normalizes every non-PDF upload to PDF before extraction
— office formats via headless LibreOffice (``pdf/convert_to_pdf.py:
61-102``, dispatch ``:84-92``), then the one extraction path. No
LibreOffice exists in this environment, and the OOXML / ODF container
formats are public specs (ECMA-376, OASIS ODF): both are zip archives
of XML, so the conversion is implemented directly — parse the document
XML, lay the paragraphs out with the deterministic fixture-builder
metrics (``pdf_build``: 60-char wrap, 30 lines/page, Courier-like
advance), emit headings as PDF outlines so the TOC path keeps working.

Legacy binary ``.doc`` (OLE CFB) is detected and rejected with a clear
error row — parsing CFB+WordBinary is out of scope (the reference
shells out to soffice for it too).
"""
from __future__ import annotations

import io
import re
import zipfile
from typing import List, Optional, Tuple
from xml.etree import ElementTree

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def xml_escape(s: str, attr: bool = False) -> str:
    """One shared XML escaper for every fixture builder (office +
    feeds): & < > always, plus quotes in attribute context."""
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        s = s.replace('"', "&quot;").replace("'", "&apos;")
    return s


WRAP_COLS = 60
LINES_PER_PAGE = 30
FONT_SIZE = 12.0


def sniff_office(payload: bytes) -> Optional[str]:
    """'docx' / 'xlsx' / 'odt' / 'ods' / 'doc' (legacy OLE), or None.
    Zip member names live in the central directory, so a plain
    substring probe over the payload is a faithful cheap test."""
    if payload.startswith(OLE_MAGIC):
        return "doc"
    if payload[:4] != b"PK\x03\x04":
        return None
    if b"word/document.xml" in payload:
        return "docx"
    if b"xl/workbook.xml" in payload:
        return "xlsx"
    if b"mimetype" in payload[:64]:
        if b"application/vnd.oasis.opendocument.text" in payload[:256]:
            return "odt"
        if b"application/vnd.oasis.opendocument.spreadsheet" \
                in payload[:256]:
            return "ods"
    return None


# ------------------------------------------------------------- parsing

def _zip_read(payload: bytes, name: str) -> bytes:
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        return z.read(name)


def docx_paragraphs(payload: bytes) -> List[Tuple[int, str]]:
    """[(heading_level, text)] — level 0 = body paragraph, 1.. = Heading
    level (``w:pStyle w:val="HeadingN"``). Tables flatten to one
    paragraph per row, cells joined by tabs (the reference's soffice
    conversion keeps table text in reading order too)."""
    root = ElementTree.fromstring(_zip_read(payload, "word/document.xml"))
    body = root.find(f"{_W}body")
    out: List[Tuple[int, str]] = []
    if body is None:
        return out

    def para_text(p) -> str:
        parts: List[str] = []
        for node in p.iter():
            if node.tag == f"{_W}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W}tab":
                parts.append("\t")
            elif node.tag == f"{_W}br":
                parts.append("\n")
        return "".join(parts)

    def para_level(p) -> int:
        st = p.find(f"{_W}pPr/{_W}pStyle")
        if st is not None:
            m = re.fullmatch(r"Heading(\d)",
                             st.get(f"{_W}val", ""))
            if m:
                return int(m.group(1))
        return 0

    for el in body:
        if el.tag == f"{_W}p":
            out.append((para_level(el), para_text(el)))
        elif el.tag == f"{_W}tbl":
            for tr in el.findall(f"{_W}tr"):
                cells = []
                for tc in tr.findall(f"{_W}tc"):
                    cells.append(" ".join(
                        para_text(p) for p in tc.findall(f"{_W}p")))
                out.append((0, "\t".join(cells)))
    return out


def odt_paragraphs(payload: bytes) -> List[Tuple[int, str]]:
    """ODF text: ``text:h`` (with outline-level) and ``text:p``;
    ``text:tab``/``text:s``/``text:line-break`` expand per spec.
    Table rows flatten to one paragraph per row with cells joined by
    tabs — the same reading-order rule as the docx path."""
    root = ElementTree.fromstring(_zip_read(payload, "content.xml"))
    out: List[Tuple[int, str]] = []

    def node_text(p) -> str:
        parts: List[str] = []
        if p.text:
            parts.append(p.text)
        for child in p:
            if child.tag == f"{_TEXT}tab":
                parts.append("\t")
            elif child.tag == f"{_TEXT}s":
                parts.append(" " * int(child.get(f"{_TEXT}c", "1")))
            elif child.tag == f"{_TEXT}line-break":
                parts.append("\n")
            else:
                parts.append(node_text(child))
            if child.tail:
                parts.append(child.tail)
        return "".join(parts)

    def walk(el) -> None:
        if el.tag == f"{_TEXT}h":
            lvl = int(el.get(f"{_TEXT}outline-level", "1"))
            out.append((lvl, node_text(el)))
        elif el.tag == f"{_TEXT}p":
            out.append((0, node_text(el)))
        elif el.tag == f"{_TABLE}table-row":
            cells = []
            for tc in el.findall(f"{_TABLE}table-cell"):
                cells.append(" ".join(node_text(p)
                                      for p in tc.findall(f"{_TEXT}p")))
            out.append((0, "\t".join(cells)))
        else:
            for child in el:
                walk(child)

    walk(root)
    return out


def xlsx_rows(payload: bytes) -> List[List[str]]:
    """Cell values of every sheet, in sheet order (shared strings
    resolved; numbers kept as their stored lexical form)."""
    shared: List[str] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        names = z.namelist()
        if "xl/sharedStrings.xml" in names:
            sroot = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sroot.findall(f"{_SSML}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_SSML}t")))
        rows: List[List[str]] = []
        # NUMERIC sheet order (lexicographic puts sheet10 before sheet2)
        sheets = sorted(
            (n for n in names
             if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)))
        for sheet in sheets:
            root = ElementTree.fromstring(z.read(sheet))
            for row in root.iter(f"{_SSML}row"):
                vals: List[str] = []
                for c in row.findall(f"{_SSML}c"):
                    v = c.find(f"{_SSML}v")
                    if v is None:
                        it = c.find(f"{_SSML}is")
                        vals.append("".join(
                            t.text or "" for t in it.iter(f"{_SSML}t"))
                            if it is not None else "")
                    elif c.get("t") == "s":
                        vals.append(shared[int(v.text or "0")])
                    else:
                        vals.append(v.text or "")
                rows.append(vals)
    return rows


def ods_rows(payload: bytes) -> List[List[str]]:
    root = ElementTree.fromstring(_zip_read(payload, "content.xml"))
    rows: List[List[str]] = []
    for tr in root.iter(f"{_TABLE}table-row"):
        vals: List[str] = []
        for tc in tr.findall(f"{_TABLE}table-cell"):
            txt = " ".join("".join(p.itertext())
                           for p in tc.findall(f"{_TEXT}p"))
            rep = int(tc.get(f"{_TABLE}number-columns-repeated", "1"))
            vals.extend([txt] * min(rep, 64))
        while vals and vals[-1] == "":
            vals.pop()
        rows.append(vals)
    return [r for r in rows if r]


# ---------------------------------------------------------- conversion

def _wrap(text: str, cols: int = WRAP_COLS) -> List[str]:
    """Greedy word wrap — same rule as the corpus PDF builder
    (``sources/pages.doc_to_page_pdf``) so office and PDF intakes share
    layout metrics."""
    lines: List[str] = []
    for hard in text.split("\n"):
        words = hard.split()
        cur: List[str] = []
        n = 0
        for w in words:
            if n + len(w) + 1 > cols and cur:
                lines.append(" ".join(cur))
                cur, n = [], 0
            cur.append(w)
            n += len(w) + 1
        lines.append(" ".join(cur))
    return lines or [""]


def office_to_pdf(payload: bytes) -> bytes:
    """Convert a sniffed office payload to the normalized PDF
    (reference: ``convert_to_pdf`` context manager). Raises
    ``ValueError`` for legacy OLE ``.doc``."""
    from .pdf_build import build_pdf

    fmt = sniff_office(payload)
    if fmt == "doc":
        raise ValueError("legacy binary .doc (OLE) is not supported; "
                         "re-save as .docx")
    if fmt in ("docx", "odt"):
        paras = (docx_paragraphs(payload) if fmt == "docx"
                 else odt_paragraphs(payload))
    elif fmt in ("xlsx", "ods"):
        rows = xlsx_rows(payload) if fmt == "xlsx" else ods_rows(payload)
        paras = [(0, "\t".join(r)) for r in rows]
    else:
        raise ValueError("not an office payload")

    lines: List[str] = []
    outline_marks: List[Tuple[int, int, str]] = []   # (line_idx, lvl, t)
    for lvl, text in paras:
        text = text.replace("\t", "  ")
        if lvl > 0 and text.strip():
            outline_marks.append((len(lines), lvl, text.strip()))
        lines.extend(_wrap(text))
    pages = [lines[i:i + LINES_PER_PAGE]
             for i in range(0, len(lines), LINES_PER_PAGE)] or [[""]]
    outlines = []
    leading = FONT_SIZE * 1.2
    for line_idx, lvl, title in outline_marks:
        page = line_idx // LINES_PER_PAGE
        row = line_idx % LINES_PER_PAGE
        outlines.append({"title": title, "page": page + 1, "level": lvl,
                         "x": 72.0, "y": 720.0 - row * leading})
    return build_pdf(pages, font_size=FONT_SIZE,
                     outlines=outlines or None)


# ------------------------------------------------- fixture builders

def build_docx(paragraphs: List[Tuple[int, str]],
               tables: Optional[List[List[List[str]]]] = None) -> bytes:
    """Minimal valid OOXML text document: [(heading_level, text)] plus
    optional tables (list of row-of-cell-texts grids appended at end)."""
    esc = xml_escape
    body = []
    for lvl, text in paragraphs:
        style = (f'<w:pPr><w:pStyle w:val="Heading{lvl}"/></w:pPr>'
                 if lvl > 0 else "")
        runs = ""
        for i, part in enumerate(text.split("\t")):
            if i:
                runs += "<w:r><w:tab/></w:r>"
            if part:
                runs += (f'<w:r><w:t xml:space="preserve">{esc(part)}'
                         f"</w:t></w:r>")
        body.append(f"<w:p>{style}{runs}</w:p>")
    for grid in tables or []:
        rows = []
        for row in grid:
            cells = "".join(
                f'<w:tc><w:p><w:r><w:t xml:space="preserve">{esc(c)}'
                f"</w:t></w:r></w:p></w:tc>" for c in row)
            rows.append(f"<w:tr>{cells}</w:tr>")
        body.append(f"<w:tbl>{''.join(rows)}</w:tbl>")
    doc = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body>'
           + "".join(body) + "</w:body></w:document>")
    ct = ('<?xml version="1.0"?><Types xmlns="http://schemas.'
          'openxmlformats.org/package/2006/content-types">'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/word/document.xml" ContentType='
          '"application/vnd.openxmlformats-officedocument.'
          'wordprocessingml.document.main+xml"/></Types>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def build_odt(paragraphs: List[Tuple[int, str]]) -> bytes:
    esc = xml_escape
    body = []
    for lvl, text in paragraphs:
        t = esc(text).replace("\t", "<text:tab/>")
        if lvl > 0:
            body.append(f'<text:h text:outline-level="{lvl}">{t}</text:h>')
        else:
            body.append(f"<text:p>{t}</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:text>" + "".join(body)
        + "</office:text></office:body></office:document-content>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        # per ODF spec the mimetype member comes first, STORED
        z.writestr(zipfile.ZipInfo("mimetype"),
                   "application/vnd.oasis.opendocument.text")
        z.writestr("content.xml", content)
    return buf.getvalue()


def build_xlsx(rows: List[List[object]]) -> bytes:
    strings: List[str] = []
    sidx = {}

    def sref(s: str) -> int:
        if s not in sidx:
            sidx[s] = len(strings)
            strings.append(s)
        return sidx[s]

    esc = xml_escape
    xml_rows = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            col = chr(ord("A") + ci)
            if isinstance(val, (int, float)):
                cells.append(f'<c r="{col}{ri}"><v>{val}</v></c>')
            else:
                cells.append(f'<c r="{col}{ri}" t="s">'
                             f"<v>{sref(str(val))}</v></c>")
        xml_rows.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet = ('<?xml version="1.0"?><worksheet xmlns="http://schemas.'
             'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
             + "".join(xml_rows) + "</sheetData></worksheet>")
    sst = ('<?xml version="1.0"?><sst xmlns="http://schemas.'
           'openxmlformats.org/spreadsheetml/2006/main">'
           + "".join(f"<si><t xml:space=\"preserve\">{esc(s)}</t></si>"
                     for s in strings) + "</sst>")
    wb = ('<?xml version="1.0"?><workbook xmlns="http://schemas.'
          'openxmlformats.org/spreadsheetml/2006/main"><sheets>'
          '<sheet name="Sheet1" sheetId="1"/></sheets></workbook>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()
