"""PDF branch: in-process layout parse → text + per-character boxes.

The reference shells a Java PDFBox driver per document
(``GetTextFromPDF.java:23-98``, ``PDFToTextWithCoordinates.java:33-608``)
to get ``PDFPlainText`` = index-aligned ``(text, charBBoxes, pages)``.
This module reimplements that *data contract* from scratch over raw PDF
bytes: object scan → page tree walk → content-stream tokenizer → text
ops (BT/ET, Tf, Td/TD/Tm/T*/TL, Tj/TJ/'/").

Font handling (round 2): per-page ``/Resources /Font`` tables are
parsed into :class:`PdfFont` — ``/FirstChar``+``/Widths`` advance
tables (CIDFont ``/W``/``/DW`` for Type0/Identity-H), ``/FontDescriptor
/MissingWidth``, and ``/ToUnicode`` CMaps (bfchar/bfrange) for the
code→text mapping; stream filters cover Flate, ASCIIHex, ASCII85, LZW
and RunLength, with image codecs (DCT/JPX/CCITT) recognized and
skipped. Fonts carrying no metric/text tables fall back to the fixed
monospace advance (``pdf_build.GLYPH_W``) that pins the synthetic
corpus goldens.

Frozen rules (the §2.8 analog, PDF side):
  P1. Coordinates rounded HALF_UP (away from zero) to 2 decimals
      (ref: ``PDFToTextWithCoordinates.java:61-65``).
  P2. Each text line is a row of chars; line breaks are ``\\n`` with a
      ``[0,0,0,0]`` box (ref: zero boxes for separators, ``.java:219-277``).
  P3. Each BT..ET text object is a *block* (paragraph analog).
  P4. Page text ends ``\\n\\f``; empty page contributes ``\\f`` only
      (ref: ``setPageEnd``, ``.java:582``; ``PAGE_SEPARATOR``,
      ``data_extract.py:47``).
  P5. NULs stripped during decode (ref: ``data_extract.py:113-114``).
  P6. needs-OCR classifier: area-based cover ratio — text_cover <
      0.3 × image_cover, with covers from char box areas and CTM-
      determinant image placement areas (ref ``page_requires_ocr`` +
      ``calc_covers``, ``pdf/pdf.py:31-33, 261-273``); char-count
      fallback when images exist but are never drawn.
"""
from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from .html_extract import ExtractError
from .pdf_build import GLYPH_W, build_pdf
from ..config import PipelineConfig

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")


# ---- stream filters ----------------------------------------------------
# The reference delegates to PDFBox's filter zoo; here the standard PDF
# filters are implemented directly (spec: PDF 32000-1 §7.4). DCTDecode /
# JPXDecode are image codecs — content streams never use them, so they
# decode to b"" and only matter for the has_image flag.

def _ascii_hex_decode(data: bytes) -> bytes:
    data = data.split(b">")[0]
    hexs = re.sub(rb"\s", b"", data)
    if len(hexs) % 2:
        hexs += b"0"
    try:
        return bytes.fromhex(hexs.decode("ascii"))
    except ValueError as e:
        raise ExtractError(f"pdf: bad ASCIIHex stream: {e}")


def _ascii85_decode(data: bytes) -> bytes:
    import base64
    data = data.strip()
    if data.startswith(b"<~"):
        data = data[2:]
    if data.endswith(b"~>"):
        data = data[:-2]
    try:
        return base64.a85decode(re.sub(rb"\s", b"", data))
    except ValueError as e:
        raise ExtractError(f"pdf: bad ASCII85 stream: {e}")


def _lzw_decode(data: bytes) -> bytes:
    """LZW as used by PDF (TIFF-style, MSB-first, codes 256=clear,
    257=EOD, 9→12-bit growing; spec §7.4.4)."""
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits = 9
    buf = 0
    nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (buf >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                bits = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) >= (1 << bits) - 1 and bits < 12:
                bits += 1
    return bytes(out)


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out += data[i + 1:i + 2 + l]
            i += 2 + l
        else:
            out += data[i + 1:i + 2] * (257 - l)
            i += 2
    return bytes(out)


_FILTERS = {
    b"FlateDecode": None,          # special-cased (zlib)
    b"Fl": None,
    b"ASCIIHexDecode": _ascii_hex_decode,
    b"AHx": _ascii_hex_decode,
    b"ASCII85Decode": _ascii85_decode,
    b"A85": _ascii85_decode,
    b"LZWDecode": _lzw_decode,
    b"LZW": _lzw_decode,
    b"RunLengthDecode": _run_length_decode,
    b"RL": _run_length_decode,
}
_IMAGE_FILTERS = {b"DCTDecode", b"DCT", b"JPXDecode", b"CCITTFaxDecode",
                  b"CCF", b"JBIG2Decode"}


def _stream_data(body: bytes) -> Optional[bytes]:
    """Raw stream bytes of an object body. Prefers the declared
    ``/Length`` (binary data may legally end in CR/LF bytes that a
    regex-to-``endstream`` scan would strip); falls back to the lazy
    scan when /Length is absent or indirect."""
    m = re.search(rb"stream\r?\n", body)
    if not m:
        return None
    start = m.end()
    # (?!\d) stops backtracking from splitting digits: without it,
    # b"/Length 12 0 R" matches group(1)='1' (indirect ref with a
    # multi-digit object number) and silently truncates the stream.
    lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", body[:m.start()])
    if lm:
        ln = int(lm.group(1))
        data = body[start:start + ln]
        # Trust the declared length only if it lands exactly at an
        # ``endstream`` (nothing but EOL whitespace in between);
        # otherwise fall back to the lazy scan.
        if len(data) == ln:
            tail = body[start + ln:start + ln + 16]
            if re.match(rb"[\r\n \t]{0,4}endstream", tail):
                return data
    sm = _STREAM_RE.search(body)
    return sm.group(1) if sm else None


def _decode_stream(dict_part: bytes, data: bytes) -> bytes:
    """Apply the /Filter chain (name or array, applied in order)."""
    fm = _FILTER_RE.search(dict_part)
    if not fm:
        return data
    if fm.group(1) is not None:
        names = [m.group(1) for m in _NAME_RE.finditer(fm.group(1))]
    else:
        names = [fm.group(2)]
    for name in names:
        if name in _IMAGE_FILTERS:
            return b""                       # image codec: no text inside
        if name in (b"FlateDecode", b"Fl"):
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ExtractError(f"pdf: bad flate stream: {e}")
        elif name in _FILTERS:
            data = _FILTERS[name](data)
        else:
            raise ExtractError(
                f"pdf: unsupported filter {name.decode('latin-1')}")
    return data


def _round_half_up(v: float) -> float:
    """HALF_UP to 2 decimals, away from zero (ref: Java RoundingMode.HALF_UP
    on BigDecimal.valueOf(double), ``PDFToTextWithCoordinates.java:61-65``).
    The 1e-9 epsilon mirrors BigDecimal's shortest-decimal reading of the
    double (1.005 stored as 1.00499…9 still rounds up)."""
    scaled = v * 100.0
    if scaled >= 0:
        r = int(scaled + 0.5 + 1e-9)
    else:
        r = -int(-scaled + 0.5 + 1e-9)
    return r / 100.0


@dataclass
class PdfFont:
    """Per-font decode + metric state (ref analog: PDFBox's PDFont —
    glyph widths consumed at ``PDFToTextWithCoordinates.java:181-204``,
    ToUnicode text mapping inside ``PDType0Font.toUnicode``).

    ``widths`` maps char code → advance in glyph space (/1000 units);
    codes absent fall back to ``missing`` (FontDescriptor /MissingWidth,
    or /DW for CIDFonts). ``to_unicode`` maps code → text. Fonts with
    no /Widths at all keep the legacy fixed monospace advance
    (``pdf_build.GLYPH_W``) so the synthetic corpus stays byte-identical.
    """
    name: str = ""
    widths: Dict[int, float] = field(default_factory=dict)
    missing: Optional[float] = None
    to_unicode: Dict[int, str] = field(default_factory=dict)
    two_byte: bool = False          # Type0 / Identity-H: 2-byte codes

    def advance(self, code: int, fs: float) -> float:
        w = self.widths.get(code, self.missing)
        if w is None:
            return GLYPH_W * fs
        return w / 1000.0 * fs

    def text(self, code: int) -> str:
        t = self.to_unicode.get(code)
        if t is not None:
            return t
        if self.two_byte:
            return ""               # unmapped CID: no reliable text
        return chr(code)            # 1-byte: latin-1 identity fallback


@dataclass
class PdfChar:
    ch: str
    bbox: Tuple[float, float, float, float]
    angle: float = 0.0     # baseline angle in degrees (Tm rotation)


@dataclass
class PdfBlockIR:
    """One BT..ET text object: lines of positioned chars."""
    lines: List[List[PdfChar]] = field(default_factory=list)


@dataclass
class PdfPageIR:
    number: int
    width: float
    height: float
    rotation: int
    blocks: List[PdfBlockIR] = field(default_factory=list)
    has_image: bool = False
    image_cover: float = 0.0    # placed image area (CTM determinant sum)

    @property
    def n_text_chars(self) -> int:
        return sum(len(ln) for b in self.blocks for ln in b.lines)

    @property
    def text_cover(self) -> float:
        """Sum of char box areas — the text side of the reference's
        cover ratio (``calc_covers``, ``pdf/pdf.py:261-273``)."""
        return sum(c.bbox[2] * c.bbox[3]
                   for b in self.blocks for ln in b.lines for c in ln)


@dataclass
class _PageObj:
    num: int
    body: bytes
    media: Tuple[float, float]
    rotate: int
    content_objs: List[int]
    has_image: bool
    fonts: Dict[str, PdfFont] = field(default_factory=dict)
    image_names: set = field(default_factory=set)


def _balanced_dict(data: bytes, start: int) -> Optional[bytes]:
    """Return the bytes of the ``<< ... >>`` dict starting at ``start``
    (which must point at ``<<``), handling nesting."""
    if data[start:start + 2] != b"<<":
        return None
    depth = 0
    i = start
    n = len(data)
    while i < n - 1:
        two = data[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
        else:
            i += 1
    return None


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_HEX_PAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEX_RANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|\[([^\]]*)\])")


def _utf16be_text(hexs: bytes) -> str:
    raw = bytes.fromhex(hexs.decode("ascii"))
    if len(raw) % 2:
        raw = raw + b"\x00"
    try:
        return raw.decode("utf-16-be")
    except UnicodeDecodeError:
        return ""


def parse_tounicode(cmap: bytes) -> Dict[int, str]:
    """/ToUnicode CMap → {char code: text}. Supports beginbfchar pairs
    and beginbfrange with scalar-destination increments or explicit
    destination arrays (spec §9.10.3; ref consumes PDFBox's equivalent).
    """
    out: Dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(cmap):
        for pm in _HEX_PAIR_RE.finditer(m.group(1)):
            out[int(pm.group(1), 16)] = _utf16be_text(pm.group(2))
    for m in _BFRANGE_RE.finditer(cmap):
        for rm in _HEX_RANGE_RE.finditer(m.group(1)):
            lo = int(rm.group(1), 16)
            hi = int(rm.group(2), 16)
            if hi - lo > 65535:
                continue
            if rm.group(3) is not None:
                base_hex = rm.group(3)
                base_raw = bytes.fromhex(base_hex.decode("ascii"))
                base = int.from_bytes(base_raw, "big")
                width = len(base_raw)
                for c in range(lo, hi + 1):
                    val = (base + (c - lo)).to_bytes(max(width, 2), "big")
                    try:
                        out[c] = val.decode("utf-16-be")
                    except UnicodeDecodeError:
                        pass
            else:
                dsts = _HEX_RE.findall(rm.group(4))
                for c, d in zip(range(lo, hi + 1), dsts):
                    out[c] = _utf16be_text(d)
    return out


class _PdfDoc:
    def __init__(self, payload: bytes, cfg: PipelineConfig):
        self.cfg = cfg
        self.objs: Dict[int, bytes] = {}
        gens: Dict[int, int] = {}
        for m in _OBJ_RE.finditer(payload):
            self.objs[int(m.group(1))] = m.group(3)
            gens[int(m.group(1))] = int(m.group(2))
        if not self.objs:
            raise ExtractError("pdf: no objects found")
        # /Encrypt in the trailer → standard-security-handler decrypt
        # of every stream and string BEFORE parsing (PDF 32000-1 §7.6;
        # reference parity: GetTextFromPDF.java:23-98 openProtection)
        from . import pdfcrypt
        enc = pdfcrypt.parse_encryption(payload, self.objs)
        if enc is not None:
            try:
                self.objs = pdfcrypt.decrypt_objects(
                    self.objs, enc, cfg.pdf_password, gens=gens)
            except pdfcrypt.BadPassword:
                raise ExtractError("pdf: wrong or missing password")
            except ValueError as ex:
                raise ExtractError(f"pdf: decrypt failed: {ex}")
        self.pages = self._collect_pages()
        if not self.pages:
            raise ExtractError("pdf: no pages found")

    # -- structure -----------------------------------------------------
    def _dict_part(self, body: bytes) -> bytes:
        i = body.find(b"stream")
        return body[:i] if i >= 0 else body

    def _collect_pages(self) -> List[_PageObj]:
        # page-tree order when a /Pages node exists; fallback = obj order
        kids_order: List[int] = []
        root = None
        for num, body in self.objs.items():
            d = self._dict_part(body)
            if b"/Type" in d and b"/Catalog" in d:
                m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", d)
                if m:
                    root = int(m.group(1))
                break
        def walk(num: int, depth: int = 0):
            if depth > 32 or num not in self.objs:
                return
            d = self._dict_part(self.objs[num])
            if b"/Kids" in d:
                m = re.search(rb"/Kids\s*\[(.*?)\]", d, re.DOTALL)
                if m:
                    for r in _REF_RE.finditer(m.group(1)):
                        walk(int(r.group(1)), depth + 1)
            elif b"/Page" in d:
                kids_order.append(num)
        if root is not None:
            walk(root)
        if not kids_order:
            kids_order = [n for n in sorted(self.objs)
                          if b"/Type" in self._dict_part(self.objs[n])
                          and re.search(rb"/Type\s*/Page\b", self._dict_part(self.objs[n]))]
        out: List[_PageObj] = []
        for num in kids_order:
            d = self._dict_part(self.objs[num])
            mb = re.search(rb"/MediaBox\s*\[([^\]]*)\]", d)
            if mb:
                nums = [float(x) for x in _NUM_RE.findall(mb.group(1))]
                media = (nums[2] - nums[0], nums[3] - nums[1]) if len(nums) == 4 else (612.0, 792.0)
            else:
                media = (612.0, 792.0)
            rot_m = re.search(rb"/Rotate\s+(-?\d+)", d)
            rot = int(rot_m.group(1)) if rot_m else 0
            cm = re.search(rb"/Contents\s+(?:\[(.*?)\]|(\d+)\s+\d+\s+R)", d, re.DOTALL)
            contents: List[int] = []
            if cm:
                if cm.group(1) is not None:
                    contents = [int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
                else:
                    contents = [int(cm.group(2))]
            image_names = self._page_image_names(d)
            fonts = self._page_fonts(d)
            out.append(_PageObj(num, d, media, rot, contents,
                                bool(image_names), fonts, image_names))
        return out

    # -- fonts ---------------------------------------------------------
    def _resolve_dict(self, data: bytes, key: bytes) -> Optional[bytes]:
        """``/Key << ... >>`` inline or ``/Key N 0 R`` indirect → dict
        bytes (of the referenced object's dict part)."""
        m = re.search(key + rb"\s*(?:(\d+)\s+\d+\s+R|(<<))", data)
        if not m:
            return None
        if m.group(1) is not None:
            body = self.objs.get(int(m.group(1)))
            return self._dict_part(body) if body is not None else None
        return _balanced_dict(data, m.start(2))

    def _stream_of(self, num: int) -> Optional[bytes]:
        body = self.objs.get(num)
        if body is None:
            return None
        data = _stream_data(body)
        if data is None:
            return None
        return _decode_stream(self._dict_part(body), data)

    def _page_fonts(self, page_dict: bytes) -> Dict[str, PdfFont]:
        res = self._resolve_dict(page_dict, rb"/Resources")
        if res is None:
            return {}
        fdict = self._resolve_dict(res, rb"/Font")
        if fdict is None:
            return {}
        fonts: Dict[str, PdfFont] = {}
        for m in re.finditer(rb"/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R",
                             fdict):
            name = m.group(1).decode("latin-1")
            if name == "Font":
                continue
            body = self.objs.get(int(m.group(2)))
            if body is not None:
                try:
                    fonts[name] = self._parse_font(self._dict_part(body),
                                                   name)
                except Exception:
                    fonts[name] = PdfFont(name=name)
        return fonts

    def _array_values(self, data: bytes, key: bytes) -> Optional[bytes]:
        """``/Key [...]`` inline or ``/Key N 0 R`` to an array object."""
        m = re.search(key + rb"\s*(?:\[([^\]]*)\]|(\d+)\s+\d+\s+R)", data,
                      re.DOTALL)
        if not m:
            return None
        if m.group(1) is not None:
            return m.group(1)
        body = self.objs.get(int(m.group(2)))
        if body is None:
            return None
        am = re.search(rb"\[(.*)\]", body, re.DOTALL)
        return am.group(1) if am else None

    def _parse_font(self, fd: bytes, name: str) -> PdfFont:
        """Simple fonts: /FirstChar + /Widths + optional /MissingWidth;
        composite (Type0/Identity-H): /DescendantFonts → /W + /DW,
        2-byte codes. /ToUnicode applies to both (ref text path:
        PDFBox font handling behind ``PDFToTextWithCoordinates.java:181``).
        """
        font = PdfFont(name=name)
        if re.search(rb"/Subtype\s*/Type0\b", fd):
            font.two_byte = True
            font.missing = 1000.0           # CIDFont /DW default
            desc = self._array_values(fd, rb"/DescendantFonts")
            if desc is not None:
                rm = _REF_RE.search(desc)
                if rm is not None:
                    dbody = self.objs.get(int(rm.group(1)))
                    if dbody is not None:
                        dd = self._dict_part(dbody)
                        dw = re.search(rb"/DW\s+([\d.]+)", dd)
                        if dw:
                            font.missing = float(dw.group(1))
                        warr = self._array_values(dd, rb"/W")
                        if warr is not None:
                            self._parse_cid_widths(warr, font)
        else:
            fc = re.search(rb"/FirstChar\s+(\d+)", fd)
            first = int(fc.group(1)) if fc else 0
            warr = self._array_values(fd, rb"/Widths")
            if warr is not None:
                ws = [float(x) for x in _NUM_RE.findall(warr)]
                font.widths = {first + i: w for i, w in enumerate(ws)}
                font.missing = 0.0          # per spec: outside range → 0
            fdesc = self._resolve_dict(fd, rb"/FontDescriptor")
            if fdesc is not None:
                mw = re.search(rb"/MissingWidth\s+([\d.]+)", fdesc)
                if mw:
                    font.missing = float(mw.group(1))
        tu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fd)
        if tu:
            cmap = self._stream_of(int(tu.group(1)))
            if cmap:
                font.to_unicode = parse_tounicode(cmap)
        return font

    def _parse_cid_widths(self, warr: bytes, font: PdfFont) -> None:
        """CIDFont /W array: ``c [w1 ... wn]`` runs and ``c1 c2 w``
        ranges (spec §9.7.4.3)."""
        toks = re.findall(rb"\[|\]|[-+]?\d*\.?\d+", warr)
        i = 0
        n = len(toks)
        while i < n:
            if toks[i] in (b"[", b"]"):
                i += 1
                continue
            start = int(float(toks[i]))
            if i + 1 < n and toks[i + 1] == b"[":
                j = i + 2
                c = start
                while j < n and toks[j] != b"]":
                    font.widths[c] = float(toks[j])
                    c += 1
                    j += 1
                i = j + 1
            elif i + 2 < n:
                end = int(float(toks[i + 1]))
                w = float(toks[i + 2])
                if 0 <= end - start <= 65535:
                    for c in range(start, end + 1):
                        font.widths[c] = w
                i += 3
            else:
                break

    def _page_image_names(self, page_dict: bytes) -> set:
        """Names of /XObject resources that are images (drives both the
        has_image flag and Do-operator cover accounting)."""
        xo = re.search(rb"/XObject\s*<<(.*?)>>", page_dict, re.DOTALL)
        names: set = set()
        if not xo:
            return names
        for m in re.finditer(rb"/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R",
                             xo.group(1)):
            obj = self.objs.get(int(m.group(2)))
            if obj is not None and b"/Image" in self._dict_part(obj):
                names.add(m.group(1).decode("latin-1"))
        return names

    def content_bytes(self, page: _PageObj) -> bytes:
        chunks: List[bytes] = []
        for num in page.content_objs:
            body = self.objs.get(num)
            if body is None:
                continue
            data = _stream_data(body)
            if data is None:
                continue
            chunks.append(_decode_stream(self._dict_part(body), data))
        return b"\n".join(chunks)


# ---- content-stream tokenizer -----------------------------------------

_TOK_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"        # literal string
    rb"|<[0-9A-Fa-f\s]*>"            # hex string
    rb"|\[|\]"
    rb"|/[^\s\[\]<>()/]*"
    rb"|[-+]?\d*\.?\d+"
    rb"|[A-Za-z'\"*]+"
)

_ESCAPES = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
            b"(": "(", b")": ")", b"\\": "\\"}


def _decode_pdf_string(raw: bytes) -> str:
    """Literal string body (without parens) → text. Latin-1 byte semantics."""
    out: List[str] = []
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1:j], 8) & 0xFF))
                i = j
                continue
            i += 2
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


class _TextState:
    """Text state with full text-matrix tracking.

    The line origin lives in ``(lx, ly)`` and the cursor advance in
    ``cursor`` (text-space units along the baseline); the rotation /
    scale part of the last ``Tm`` is kept in ``(ma, mb, mc, md)``.
    Device position of the cursor = ``(lx + ma*cursor, ly + mb*cursor)``
    — at the identity matrix this degenerates to the legacy
    ``(x, y) = (lx + cursor, ly)`` math bit-for-bit. Rotated text
    objects (ref: per-angle re-extraction passes,
    ``PDFToTextWithCoordinates.java:463-533``) therefore extract in the
    SAME single pass here, with each char carrying its baseline angle;
    the per-angle grouping + inverse restore lives in
    :func:`rotated_regions` / :func:`page_deskew_angle`."""
    __slots__ = ("fs", "px", "py", "lx", "ly", "leading", "font",
                 "ma", "mb", "mc", "md")

    def __init__(self):
        self.fs = 12.0
        self.px = self.py = 0.0          # current device-space pen point
        self.lx = self.ly = 0.0          # device-space line origin
        self.leading = 14.4
        self.font: Optional[PdfFont] = None
        self.ma, self.mb, self.mc, self.md = 1.0, 0.0, 0.0, 1.0

    @property
    def identity(self) -> bool:
        return (self.ma == 1.0 and self.mb == 0.0
                and self.mc == 0.0 and self.md == 1.0)

    @property
    def angle_deg(self) -> float:
        import math
        return math.degrees(math.atan2(self.mb, self.ma))

    def advance(self, w: float) -> None:
        """Move the pen by text-space width ``w`` along the baseline.
        At the identity matrix this is exactly the legacy ``x += w``
        (same float-op order → span byte-identity preserved)."""
        if self.mb == 0.0:
            self.px += self.ma * w if self.ma != 1.0 else w
        else:
            self.px += self.ma * w
            self.py += self.mb * w

    def char_box(self, w: float) -> Tuple[float, float, float, float]:
        """Axis-aligned bbox of the (possibly rotated) glyph cell of
        text-space width ``w`` and height ``fs`` at the pen point."""
        if self.mb == 0.0 and self.mc == 0.0 and self.ma == 1.0 \
                and self.md == 1.0:
            return (_round_half_up(self.px), _round_half_up(self.py),
                    _round_half_up(w), _round_half_up(self.fs))
        wx, wy = self.ma * w, self.mb * w
        hx, hy = self.mc * self.fs, self.md * self.fs
        xs = (self.px, self.px + wx, self.px + hx, self.px + wx + hx)
        ys = (self.py, self.py + wy, self.py + hy, self.py + wy + hy)
        return (_round_half_up(min(xs)), _round_half_up(min(ys)),
                _round_half_up(max(xs) - min(xs)),
                _round_half_up(max(ys) - min(ys)))

    def translate_line(self, tx: float, ty: float) -> None:
        """Td/T*: displace the line origin by a TEXT-SPACE translation
        (runs through the rotation/scale part of the matrix)."""
        if self.identity:
            self.lx += tx
            self.ly += ty
        else:
            self.lx += self.ma * tx + self.mc * ty
            self.ly += self.mb * tx + self.md * ty
        self.px, self.py = self.lx, self.ly


def parse_content_text(content: bytes, page: PdfPageIR, cfg: PipelineConfig,
                       fonts: Optional[Dict[str, PdfFont]] = None,
                       image_names: Optional[set] = None) -> None:
    """Run the text operators of one page's content stream into ``page``.

    Also tracks the CTM *determinant* through q/Q/cm so each image
    ``Do`` contributes its placed area to ``page.image_cover`` — the
    image side of the reference's needs-OCR cover ratio
    (``calc_covers`` + ``page_requires_ocr``, ``pdf/pdf.py:31-33,
    261-273``); the determinant of a matrix product is the product of
    determinants, so the area needs no full matrix stack."""
    st = _TextState()
    fonts = fonts or {}
    image_names = image_names or set()
    det = 1.0
    det_stack: List[float] = []
    stack: List[object] = []
    cur_block: Optional[PdfBlockIR] = None
    cur_line: List[PdfChar] = []
    n_tok = 0

    def new_line():
        nonlocal cur_line
        if cur_block is not None and cur_line:
            cur_block.lines.append(cur_line)
        cur_line = []

    def emit_string(s: str):
        """String chars → positioned glyphs. With a bound font the char
        codes go through its /Widths advance table and /ToUnicode text
        map (ref: glyph append loop, ``PDFToTextWithCoordinates.java:
        181-204``); a font with neither table reduces to the legacy
        fixed-monospace model, keeping the synthetic corpus byte-stable.
        A code whose /ToUnicode value is multi-char emits one box per
        output char at the same position (index alignment rule §2.8(7)).
        """
        nonlocal cur_line
        if cur_block is None:
            return
        font = st.font
        angle = 0.0 if st.mb == 0.0 else round(st.angle_deg, 2)
        if font is None or not (font.widths or font.to_unicode
                                or font.two_byte):
            # metric-less font (e.g. bare base-14 reference): legacy
            # fixed-advance path, byte-identical to r01 behavior
            for ch in s:
                if ch == "\x00" and cfg.remove_nuls:
                    continue
                w = GLYPH_W * st.fs
                cur_line.append(PdfChar(ch, st.char_box(w), angle))
                st.advance(w)
            return
        raw = s.encode("latin-1", errors="replace")
        if font.two_byte:
            codes = [(raw[i] << 8) | raw[i + 1]
                     for i in range(0, len(raw) - 1, 2)]
        else:
            codes = list(raw)
        for code in codes:
            w = font.advance(code, st.fs)
            box = st.char_box(w)
            for ch in font.text(code):
                if ch == "\x00" and cfg.remove_nuls:
                    continue
                cur_line.append(PdfChar(ch, box, angle))
            st.advance(w)

    for m in _TOK_RE.finditer(content):
        n_tok += 1
        if n_tok > cfg.max_pdf_tokens:
            raise ExtractError("pdf: content token budget exceeded")
        tok = m.group(0)
        c0 = tok[:1]
        if c0 == b"(":
            stack.append(_decode_pdf_string(tok[1:-1]))
        elif c0 == b"<" and tok != b"<<":
            hexs = re.sub(rb"\s", b"", tok[1:-1])
            if len(hexs) % 2:
                hexs += b"0"
            stack.append(bytes.fromhex(hexs.decode("ascii")).decode("latin-1"))
        elif c0 in b"[]":
            stack.append(tok.decode("ascii"))
        elif c0 == b"/":
            stack.append(tok.decode("latin-1"))
        elif tok[:1].isdigit() or c0 in b"-+." or (len(tok) > 1 and tok[1:2].isdigit() and c0 in b"-+"):
            try:
                stack.append(float(tok))
            except ValueError:
                stack.append(0.0)
        else:
            op = tok.decode("latin-1")
            if op == "BT":
                cur_block = PdfBlockIR()
                st.px = st.py = st.lx = st.ly = 0.0
                st.ma, st.mb, st.mc, st.md = 1.0, 0.0, 0.0, 1.0
            elif op == "ET":
                new_line()
                if cur_block is not None and cur_block.lines:
                    page.blocks.append(cur_block)
                cur_block = None
            elif op == "Tf":
                if stack and isinstance(stack[-1], float):
                    st.fs = stack[-1]
                for v in reversed(stack[:-1]):
                    if isinstance(v, str) and v.startswith("/"):
                        st.font = fonts.get(v[1:])
                        break
            elif op == "TL":
                if stack and isinstance(stack[-1], float):
                    st.leading = stack[-1]
            elif op in ("Td", "TD"):
                nums = [v for v in stack[-2:] if isinstance(v, float)]
                if len(nums) == 2:
                    tx, ty = nums
                    if op == "TD":
                        st.leading = -ty
                    new_line()
                    st.translate_line(tx, ty)
            elif op == "Tm":
                nums = [v for v in stack[-6:] if isinstance(v, float)]
                if len(nums) == 6:
                    new_line()
                    st.ma, st.mb, st.mc, st.md = nums[0], nums[1], \
                        nums[2], nums[3]
                    st.lx, st.ly = nums[4], nums[5]
                    st.px, st.py = st.lx, st.ly
            elif op == "T*":
                new_line()
                st.translate_line(0.0, -st.leading)
            elif op == "Tj":
                if stack and isinstance(stack[-1], str) and not stack[-1].startswith("/"):
                    emit_string(stack[-1])
            elif op == "'":
                new_line()
                st.translate_line(0.0, -st.leading)
                if stack and isinstance(stack[-1], str):
                    emit_string(stack[-1])
            elif op == '"':
                new_line()
                st.translate_line(0.0, -st.leading)
                if stack and isinstance(stack[-1], str):
                    emit_string(stack[-1])
            elif op == "q":
                det_stack.append(det)
            elif op == "Q":
                det = det_stack.pop() if det_stack else 1.0
            elif op == "cm":
                nums = [v for v in stack[-6:] if isinstance(v, float)]
                if len(nums) == 6:
                    det *= nums[0] * nums[3] - nums[1] * nums[2]
            elif op == "Do":
                name = next((v for v in reversed(stack)
                             if isinstance(v, str) and v.startswith("/")),
                            None)
                if name is not None and name[1:] in image_names:
                    page.image_cover += abs(det)
            elif op == "TJ":
                # array form: strings advance chars; numbers adjust x by
                # -n/1000 * fs (kerning)
                items: List[object] = []
                for v in reversed(stack):
                    if v == "[":
                        break
                    items.append(v)
                items.reverse()
                for v in items:
                    if isinstance(v, str) and v not in ("]",) and not v.startswith("/"):
                        emit_string(v)
                    elif isinstance(v, float):
                        st.advance(-(v / 1000.0 * st.fs))
            stack.clear()


def extract_pdf(payload: bytes, cfg: PipelineConfig) -> List[PdfPageIR]:
    """Parse a whole PDF payload into per-page IR (page-tree order)."""
    return extract_pdf_pages(_PdfDoc(payload, cfg), cfg)


def extract_pdf_pages(doc: "_PdfDoc",
                      cfg: PipelineConfig) -> List[PdfPageIR]:
    """Per-page IR from an already-parsed (and, if encrypted,
    already-decrypted) document — callers needing both pages and TOC
    build ``_PdfDoc`` ONCE instead of re-running the object scan and
    the standard-handler decrypt per consumer."""
    pages: List[PdfPageIR] = []
    for i, pobj in enumerate(doc.pages, start=1):
        pg = PdfPageIR(number=i, width=pobj.media[0], height=pobj.media[1],
                       rotation=pobj.rotate, has_image=pobj.has_image)
        parse_content_text(doc.content_bytes(pobj), pg, cfg, pobj.fonts,
                           pobj.image_names)
        pages.append(pg)
    return pages


# ---- per-angle rotated text (ref: PDFToTextWithCoordinates.java:463-533)
def page_deskew_angle(page: PdfPageIR) -> Tuple[float, bool]:
    """Char-count-weighted dominant baseline angle of a page and whether
    it passes the stddev acceptance gate — the engine's analog of the
    reference's AngleCollector clustering (``.java:285-452``), feeding
    ``PDFPlainTextPage.deskewAngle``. Angle weights = 1 per char."""
    from .rotation import cluster_angles
    angles = [c.angle for b in page.blocks for ln in b.lines for c in ln]
    if not angles:
        return 0.0, False
    return cluster_angles(angles, [1.0] * len(angles))


def rotated_regions(page: PdfPageIR) -> List[dict]:
    """Group a page's chars by clustered baseline angle and restore each
    group's boxes through the INVERSE rotation — the analog of the
    reference's per-angle re-extraction pass (rotate page by -θ,
    extract axis-aligned, restore through the inverse transform,
    ``PDFToTextWithCoordinates.java:463-533``; here the single
    matrix-aware pass already yields page-space boxes, so the inverse
    projection recovers the axis-aligned per-angle layout).

    Returns [{angle, text, boxes}] with ``boxes`` axis-aligned in the
    de-rotated frame (a 30°-rotated paragraph comes back with the same
    boxes its unrotated twin would have, up to rounding)."""
    import math
    groups: Dict[float, List[PdfChar]] = {}
    for b in page.blocks:
        for ln in b.lines:
            for c in ln:
                groups.setdefault(c.angle, []).append(c)
    out: List[dict] = []
    for angle in sorted(groups):
        chars = groups[angle]
        th = math.radians(angle)
        cos_t, sin_t = math.cos(th), math.sin(th)
        ac, asn = abs(cos_t), abs(sin_t)
        denom = ac * ac - asn * asn
        boxes = []
        for c in chars:
            x, y, w, h = c.bbox
            if angle == 0.0:
                boxes.append((x, y, w, h))
                continue
            # the page-space bbox of a cw×ch cell rotated by θ has
            # extents (cw|cos|+ch|sin|, cw|sin|+ch|cos|) — invert:
            if abs(denom) > 1e-9:
                cell_w = (ac * w - asn * h) / denom
                cell_h = (ac * h - asn * w) / denom
            else:                      # 45°: extents degenerate
                cell_w = cell_h = w / (ac + asn)
            # reconstruct the cell origin O from the bbox min corner:
            # corner offsets from O are 0, w⃗, h⃗, w⃗+h⃗
            wx, wy = cos_t * cell_w, sin_t * cell_w
            hx, hy = -sin_t * cell_h, cos_t * cell_h
            ox = x - min(0.0, wx, hx, wx + hx)
            oy = y - min(0.0, wy, hy, wy + hy)
            # de-rotate the origin → axis-aligned per-angle layout
            rx = cos_t * ox + sin_t * oy
            ry = -sin_t * ox + cos_t * oy
            boxes.append((_round_half_up(rx), _round_half_up(ry),
                          _round_half_up(cell_w), _round_half_up(cell_h)))
        out.append({"angle": angle,
                    "text": "".join(c.ch for c in chars),
                    "boxes": boxes})
    return out


def page_needs_ocr(page: PdfPageIR) -> bool:
    """Rule P6 — the reference's area-based cover ratio: a page needs
    OCR iff ``text_cover < 0.3 * image_cover`` (``page_requires_ocr``,
    ``pdf/pdf.py:31-33``; covers summed per ``calc_covers``,
    ``:261-273``). Pages whose image XObjects are never drawn (no
    ``Do``) fall back to the r01 char-count heuristic."""
    if page.image_cover > 0.0:
        return page.text_cover < 0.3 * page.image_cover
    return page.has_image and page.n_text_chars < 10


def split_pdf_to_page_pdfs(payload: bytes, cfg: PipelineConfig) -> List[Tuple[int, bytes]]:
    """Split a PDF into standalone single-page PDFs (the M5 analog,
    ref ``pdf/pdf.py:285-324``). Returns [(1-based page_no, pdf_bytes)].

    Used by the skew path: giant PDFs explode into per-page rows, are
    extracted independently, and reassemble via ``groupby(url)`` with
    offset shifting (ref chord fan-in, ``tasks.py:287-293``).

    Outline nesting note: a per-page chunk PDF cannot encode outline
    levels whose ancestors live on other pages, so chunk PDFs carry a
    flattened per-page tree. BOTH consumers compensate with the
    whole-document TOC: the in-actor split path re-reads it
    (stages/extract_stage.py), and the distributed exploded path ships
    it as the ``doc_toc`` side-channel column through the groupby merge
    (stages/chunk.py, r2) — nested levels survive both paths exactly
    (tests/test_chunk.py::test_exploded_pipeline_nested_toc_levels).
    """
    doc = _PdfDoc(payload, cfg)
    try:
        toc = extract_pdf_toc(payload, cfg)
    except Exception:
        toc = []
    out: List[Tuple[int, bytes]] = []
    for i, pobj in enumerate(doc.pages, start=1):
        content = doc.content_bytes(pobj)
        # the original content keeps its own image cm/Do operators and
        # build_pdf(image_pages=...) re-adds the /Im1 resource, so both
        # has_image and the area-based needs-OCR cover survive exactly
        # carry this page's outline entries (rebased to page 1) so the
        # merged TOC equals the whole-document TOC
        page_outlines = [
            {"title": e["title"], "page": 1, "level": e["level"],
             "x": e["left"], "y": e["top"]}
            for e in toc if e["page"] == i]
        single = build_pdf(
            pages=[[]],
            media_box=pobj.media,
            rotations=[pobj.rotate],
            image_pages=[1] if pobj.has_image else None,
            raw_contents=[content],
            outlines=page_outlines or None,
        )
        out.append((i, single))
    return out


def extract_pdf_toc(payload: bytes, cfg: PipelineConfig) -> List[dict]:
    """Parse the /Outlines tree into TOC entries ``{title, level, left,
    top, page}`` in document order (ref: ``GetTOCFromPDF.java:37-95``,
    sorted by page at ``:92``)."""
    return extract_pdf_toc_from_doc(_PdfDoc(payload, cfg))


def extract_pdf_toc_from_doc(doc: "_PdfDoc") -> List[dict]:
    page_index = {p.num: i + 1 for i, p in enumerate(doc.pages)}
    root = None
    for num, body in doc.objs.items():
        d = doc._dict_part(body)
        if b"/Catalog" in d:
            m = re.search(rb"/Outlines\s+(\d+)\s+\d+\s+R", d)
            if m:
                root = int(m.group(1))
            break
    if root is None:
        return []
    out: List[dict] = []

    def first_ref(body: bytes, key: bytes):
        m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", body)
        return int(m.group(1)) if m else None

    def walk(num, level: int, budget: List[int]):
        seen = set()
        while num is not None and num in doc.objs and num not in seen:
            seen.add(num)
            budget[0] += 1
            if budget[0] > 10_000:
                return
            body = doc._dict_part(doc.objs[num])
            tm = re.search(rb"/Title\s*\(((?:[^()\\]|\\.)*)\)", body, re.DOTALL)
            title = _decode_pdf_string(tm.group(1)) if tm else ""
            dm = re.search(
                rb"/Dest\s*\[\s*(\d+)\s+\d+\s+R\s*/XYZ\s+([-\d.]+)\s+([-\d.]+)",
                body)
            page = left = top = None
            if dm:
                page = page_index.get(int(dm.group(1)))
                left = float(dm.group(2))
                top = float(dm.group(3))
            if title and page is not None:
                out.append({"title": title, "level": level,
                            "left": left, "top": top, "page": page})
            child = first_ref(body, rb"/First")
            if child is not None:
                walk(child, level + 1, budget)
            num = first_ref(body, rb"/Next")

    start = first_ref(doc._dict_part(doc.objs[root]), rb"/First")
    walk(start, 1, [0])
    out.sort(key=lambda e: e["page"])   # ref: sorted by page
    return out


def extract_pdf_full(payload: bytes, cfg: PipelineConfig):
    """(pages IR, toc entries) from ONE object scan + decrypt."""
    doc = _PdfDoc(payload, cfg)
    return extract_pdf_pages(doc, cfg), extract_pdf_toc_from_doc(doc)
