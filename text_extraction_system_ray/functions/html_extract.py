"""HTML branch: DOM block tree + boilerplate classification.

The reference's core op extracts text + per-character coordinates from PDF
via a Java PDFBox driver (``data_extract/data_extract.py:51-204``,
``PDFToTextWithCoordinates.java``). For Common-Crawl-style web pages the
analogous core op is main-content extraction from HTML: tokenize the markup
into a flat *block* sequence (the DOM block tree linearized), score each
block by text density / link density (Readability / Boilerpipe-style), and
drop boilerplate.

Built on the stdlib ``html.parser.HTMLParser`` (no third-party HTML libs in
the environment) — an iterative state machine, so pathological nesting
cannot blow the Python stack. All rules below are FROZEN: the distributed
pipeline and the serial oracle share this module, and the byte-identity
contract (BASELINE.json ``north_rule``) hangs off it.

Frozen assembly rules (the §2.8 analog of SURVEY.md):
  H1. Payload decoded as UTF-8 with ``errors='replace'``; BOM stripped.
  H2. Entities/charrefs decoded by the tokenizer (``convert_charrefs``).
  H3. ``script style noscript template svg iframe object embed applet
      canvas select datalist button textarea`` subtrees are dropped.
  H4. A *block* is a maximal text run between block-tag boundaries
      (``BLOCK_TAGS``); ``<br>``/``<hr>`` also flush. Inline tags do not.
  H5. Per-block whitespace (incl. NBSP) collapses to single spaces and is
      stripped at the ends; ``<pre>`` keeps internal newlines. NUL and C0
      control chars are removed during block build (ref analog:
      ``data_extract.py:113-114``).
  H6. Boilerplate containers: ``nav header footer aside`` or class/id
      matching ``BP_ATTR_RE``. Blocks inside keep only if
      link_density < 0.34 and words >= 10 (content rescue). Outside,
      a block drops if link_density > 0.66 and words < 25 (link farm);
      headings are exempt from the link-farm drop.
  H7. ``<title>`` is captured as the document title candidate, not a block.
  H8. ``<table>`` cells are blocks (part of the text) AND the cell matrix
      is captured as a table DTO (ref analog: Camelot tables,
      ``data_extract/tables.py:10-27``).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List, Optional, Tuple

from ..config import PipelineConfig

# Tags whose entire subtree is dropped (rule H3).
DROP_TAGS = frozenset(
    "script style noscript template svg iframe object embed applet canvas "
    "select datalist button textarea".split()
)

# Block-level boundaries (rule H4). Opening or closing one flushes the block.
BLOCK_TAGS = frozenset(
    "address article aside blockquote body caption dd details dialog div dl dt "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup li "
    "main nav ol p pre section summary table tbody td tfoot th thead tr ul "
    "html".split()
)

# Flush-only void tags.
FLUSH_VOID_TAGS = frozenset({"br", "hr"})

# Semantic boilerplate containers (rule H6).
BP_TAGS = frozenset({"nav", "header", "footer", "aside"})
BP_ATTR_RE = re.compile(
    r"(?:^|[-_ ])(?:nav|menu|footer|header|sidebar|side-bar|breadcrumbs?|banner|"
    r"ads?|advert\w*|promo|share|sharing|social|comments?|cookie|popup|related|"
    r"widget|pagination|pager)(?:[-_ ]|$)",
    re.IGNORECASE,
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

_WS_RE = re.compile("[ \\t\\r\\n\\f\\v\\u00a0\\u2007\\u202f]+")
_CTRL_RE = re.compile(r"[\x00-\x08\x0e-\x1f\x7f]")
_PRE_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0e-\x1f\x7f]")
_WORD_RE = re.compile(r"\S+")

_MAX_STACK_DEPTH = 512


class ExtractError(Exception):
    """Deterministic per-row failure (budget exceeded, unparseable payload)."""


@dataclass
class Block:
    text: str
    kind: str            # 'p' | 'h1'..'h6' | 'li' | 'cell' | 'pre'
    n_words: int
    n_link_words: int
    bp: bool             # inside a boilerplate container
    raw_index: int       # sequence number in the raw (pre-filter) block stream

    @property
    def link_density(self) -> float:
        return self.n_link_words / self.n_words if self.n_words else 0.0


@dataclass
class HtmlTable:
    rows: List[List[str]]
    raw_index: int       # raw block sequence number at which the table started

    @property
    def n_cols(self) -> int:
        return max((len(r) for r in self.rows), default=0)


class _BlockParser(HTMLParser):
    """Linearizes markup into (text, is_link) runs grouped into blocks."""

    def __init__(self, cfg: PipelineConfig):
        super().__init__(convert_charrefs=True)
        self.cfg = cfg
        self.events = 0
        self.stack: List[str] = []           # open element names (capped depth)
        self.drop_depth = 0                  # >0 → inside a dropped subtree
        self.bp_flags: List[bool] = []       # parallel to stack: element opened a bp scope
        self.bp_depth = 0
        self.a_depth = 0
        self.pre_depth = 0
        self.in_title = False
        self.title_parts: List[str] = []
        # current block accumulation
        self.runs: List[Tuple[str, bool]] = []   # (raw text, inside_link)
        self.cur_kind = "p"
        self.blocks: List[Block] = []
        self.raw_counter = 0
        # table capture: stack of {rows, cur_row, cell_parts, raw_index}
        self.table_stack: List[dict] = []
        self.tables: List[HtmlTable] = []

    # ---- budget -------------------------------------------------------
    def _tick(self):
        self.events += 1
        if self.events > self.cfg.max_parse_events:
            raise ExtractError("html parse event budget exceeded")

    # ---- block assembly ----------------------------------------------
    def _flush(self, kind_override: Optional[str] = None):
        if not self.runs:
            return
        runs, self.runs = self.runs, []
        if self.pre_depth > 0 or (kind_override or self.cur_kind) == "pre":
            raw = "".join(t for t, _ in runs)
            raw = raw.replace("\r\n", "\n").replace("\r", "\n")
            text = _PRE_CTRL_RE.sub("", raw).strip("\n").rstrip()
        else:
            raw = "".join(t for t, _ in runs)
            text = _WS_RE.sub(" ", _CTRL_RE.sub("", raw)).strip()
        if not text:
            return
        n_words = len(_WORD_RE.findall(text))
        link_chars = sum(len(t) for t, in_a in runs if in_a)
        total_chars = sum(len(t) for t, _ in runs)
        # link word share approximated by char share scaled to words (deterministic)
        n_link_words = (
            round(n_words * (link_chars / total_chars)) if total_chars else 0
        )
        kind = kind_override or self.cur_kind
        self.blocks.append(
            Block(
                text=text,
                kind=kind,
                n_words=n_words,
                n_link_words=n_link_words,
                bp=self.bp_depth > 0,
                raw_index=self.raw_counter,
            )
        )
        self.raw_counter += 1
        self.cur_kind = "p"

    # ---- tag handlers -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._tick()
        if tag in DROP_TAGS:
            self.drop_depth += 1
            self._push(tag, False)
            return
        if self.drop_depth:
            self._push(tag, False)
            return
        if tag == "title":
            self.in_title = True
            self._push(tag, False)
            return
        is_bp = tag in BP_TAGS or self._attrs_bp(attrs)
        if tag in BLOCK_TAGS or tag in FLUSH_VOID_TAGS:
            self._flush()
        if tag in HEADING_TAGS:
            self.cur_kind = tag
        elif tag == "li":
            self.cur_kind = "li"
        elif tag == "pre":
            self.cur_kind = "pre"
            self.pre_depth += 1
        elif tag in ("td", "th"):
            self.cur_kind = "cell"
            if self.table_stack:
                t = self.table_stack[-1]
                if t["cur_row"] is None:
                    t["cur_row"] = []
                t["cell_parts"] = []
        elif tag == "table":
            self.table_stack.append(
                {"rows": [], "cur_row": None, "cell_parts": None,
                 "raw_index": self.raw_counter}
            )
        elif tag == "tr":
            if self.table_stack:
                t = self.table_stack[-1]
                if t["cur_row"] is not None:
                    t["rows"].append(t["cur_row"])
                t["cur_row"] = []
        elif tag == "a":
            self.a_depth += 1
        if is_bp:
            self.bp_depth += 1
        if tag not in FLUSH_VOID_TAGS and tag not in ("img", "input", "meta",
                                                      "link", "wbr", "source"):
            self._push(tag, is_bp)
        elif is_bp:
            # void bp tag: close its scope immediately
            self.bp_depth -= 1

    def handle_endtag(self, tag):
        self._tick()
        if tag == "title":
            self.in_title = False
        if tag in DROP_TAGS:
            if self.drop_depth:
                self.drop_depth -= 1
            self._pop(tag)
            return
        if self.drop_depth:
            self._pop(tag)
            return
        if tag in BLOCK_TAGS or tag in FLUSH_VOID_TAGS:
            kind = tag if tag in HEADING_TAGS else None
            if tag == "li":
                kind = "li"
            elif tag in ("td", "th"):
                kind = "cell"
            elif tag == "pre":
                kind = "pre"
            self._flush(kind_override=kind)
        if tag == "pre" and self.pre_depth:
            self.pre_depth -= 1
        if tag in ("td", "th") and self.table_stack:
            t = self.table_stack[-1]
            if t["cell_parts"] is not None and t["cur_row"] is not None:
                cell = _WS_RE.sub(" ", _CTRL_RE.sub("", "".join(t["cell_parts"]))).strip()
                t["cur_row"].append(cell)
                t["cell_parts"] = None
        elif tag == "tr" and self.table_stack:
            t = self.table_stack[-1]
            if t["cur_row"] is not None:
                t["rows"].append(t["cur_row"])
                t["cur_row"] = None
        elif tag == "table" and self.table_stack:
            t = self.table_stack.pop()
            if t["cur_row"] is not None:
                t["rows"].append(t["cur_row"])
            rows = [r for r in t["rows"] if r]
            if rows:
                self.tables.append(HtmlTable(rows=rows, raw_index=t["raw_index"]))
        elif tag == "a" and self.a_depth:
            self.a_depth -= 1
        self._pop(tag)

    def handle_data(self, data):
        self._tick()
        if self.drop_depth or not data:
            return
        if self.in_title:
            self.title_parts.append(data)
            return
        self.runs.append((data, self.a_depth > 0))
        if self.table_stack and self.table_stack[-1]["cell_parts"] is not None:
            self.table_stack[-1]["cell_parts"].append(data)

    # ---- element stack (bounded; malformed HTML tolerated) -----------
    def _push(self, tag: str, is_bp: bool):
        if len(self.stack) < _MAX_STACK_DEPTH:
            self.stack.append(tag)
            self.bp_flags.append(is_bp)

    def _pop(self, tag: str):
        # pop back to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == tag:
                for j in range(len(self.stack) - 1, i - 1, -1):
                    if self.bp_flags[j] and self.bp_depth:
                        self.bp_depth -= 1
                del self.stack[i:]
                del self.bp_flags[i:]
                return

    @staticmethod
    def _attrs_bp(attrs) -> bool:
        for k, v in attrs:
            if v and k in ("class", "id", "role") and BP_ATTR_RE.search(v):
                return True
        return False


# ---- fast tokenizer ---------------------------------------------------
# Drives the SAME handler state machine as html.parser but with a single
# compiled regex walk — ~2x faster, no per-char position bookkeeping.
# The stdlib path is kept for reference/debug (parse_html_blocks(...,
# engine="stdlib")); both are driven by the same _BlockParser handlers,
# and the e2e byte-identity contract binds to whichever engine cfg selects
# (both oracle and pipeline share this module).

# Possessive quantifiers (3.11+) keep every branch linear-time; the
# start-tag branch matches only the NAME — the attrs region is scanned by
# the quote-aware linear loop in _scan_tag_end (a backtracking attrs
# regex here is exponential on unterminated attr-heavy tags: ReDoS).
_FAST_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?(?:-->|$)"                                   # comment
    r"|!\[CDATA\[.*?(?:\]\]>|$)"                         # cdata
    r"|![^>]*+>"                                         # doctype/decl
    r"|\?[^>]*+>"                                        # processing instr
    r"|(?P<end>/)\s*+(?P<endname>[a-zA-Z][a-zA-Z0-9:_.-]*+)[^>]*+>"
    r"|(?P<name>[a-zA-Z][a-zA-Z0-9:_.-]*+)"
    r")",
    re.DOTALL)

# run of chars inside a start tag that need no special handling
_ATTRS_PLAIN_RE = re.compile(r"[^>\"']*")


def _scan_tag_end(text: str, pos: int) -> int:
    """Linear quote-aware scan for the ``>`` closing a start tag.

    Returns the index of the closing ``>``, or -1 when the tag never
    closes (truncated input). Mirrors html.parser's
    ``locatestarttagend_tolerant``: a quote opens a quoted attribute
    value only in *value position* (after ``=``, spaces allowed) and may
    then contain ``>``; an unterminated value quote makes the whole tag
    incomplete; quotes anywhere else are ordinary characters. Runs in
    O(n) with no backtracking (the ReDoS fix; see ADVICE r01)."""
    n = len(text)
    i = pos
    while i < n:
        i = _ATTRS_PLAIN_RE.match(text, i).end()
        if i >= n:
            return -1
        c = text[i]
        if c == ">":
            return i
        # c is ' or ": quoted value iff the last non-space char was '='
        k = i - 1
        while k >= pos and text[k] in " \t\n\r\f":
            k -= 1
        if k >= pos and text[k] == "=":
            j = text.find(c, i + 1)
            if j < 0:
                return -1                # unterminated value → truncated tag
            i = j + 1
        else:
            i += 1                       # stray quote: plain char
    return -1

_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*"
    r"(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))")

_ATTR_QUICK = ("class", "id", "role")

# raw-text elements: content until the matching close tag, never parsed
_RAWTEXT = frozenset({"script", "style", "textarea", "title"})
_RAWTEXT_CLOSE = {t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE)
                  for t in _RAWTEXT}


def _fast_feed(p: "_BlockParser", text: str) -> None:
    import html as _html
    pos = 0
    n = len(text)
    unescape = _html.unescape
    while pos < n:
        lt = text.find("<", pos)
        if lt < 0:
            data = text[pos:]
            if data:
                p.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = text[pos:lt]
            p.handle_data(unescape(data) if "&" in data else data)
        m = _FAST_TAG_RE.match(text, lt)
        if m is None:
            # stray '<' — treated as text (html.parser's recovery)
            p.handle_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        name = m.group("name")
        if name is not None:
            gt = _scan_tag_end(text, pos)
            if gt < 0:
                # truncated start tag at EOF — stdlib recovery
                # (html.parser goahead: emit up to next '>' or '<' or
                # just the '<' as data, continue after it)
                k = text.find(">", lt + 1)
                if k < 0:
                    k = text.find("<", lt + 1)
                    k = k if k >= 0 else n
                else:
                    k += 1
                data = text[lt:k]
                p.handle_data(unescape(data) if "&" in data else data)
                pos = k
                continue
            tag = name.lower()
            attrs_raw = text[pos:gt]
            pos = gt + 1
            attrs = []
            if attrs_raw and any(k in attrs_raw for k in _ATTR_QUICK):
                for am in _ATTR_RE.finditer(attrs_raw):
                    v = am.group(2) or am.group(3) or am.group(4) or ""
                    attrs.append((am.group(1).lower(),
                                  unescape(v) if "&" in v else v))
            selfclose = attrs_raw.rstrip().endswith("/")
            if tag in _RAWTEXT and not selfclose:
                # consume raw content up to the close tag in one step
                cm = _RAWTEXT_CLOSE[tag].search(text, pos)
                p.handle_starttag(tag, attrs)
                raw = text[pos:cm.start()] if cm else text[pos:]
                if raw:
                    if tag == "title" and "&" in raw:
                        raw = unescape(raw)
                    p.handle_data(raw)
                p.handle_endtag(tag)
                pos = cm.end() if cm else n
            else:
                p.handle_starttag(tag, attrs)
                if selfclose:
                    p.handle_endtag(tag)
        else:
            endname = m.group("endname")
            if endname is not None:
                p.handle_endtag(endname.lower())
            # comments/doctype/PI: ignored


def parse_html_blocks(
    html_text: str, cfg: PipelineConfig, engine: str = "fast"
) -> Tuple[List[Block], Optional[str], List[HtmlTable]]:
    """Tokenize HTML into the raw block stream. Returns (blocks, title, tables)."""
    p = _BlockParser(cfg)
    if engine == "fast":
        _fast_feed(p, html_text)
    else:
        p.feed(html_text)
        p.close()
    p._flush()
    title_raw = "".join(p.title_parts)
    title = _WS_RE.sub(" ", _CTRL_RE.sub("", title_raw)).strip() or None
    return p.blocks, title, p.tables


def classify_blocks(blocks: List[Block], cfg: PipelineConfig) -> List[Block]:
    """Boilerplate filter (rule H6). Returns kept blocks in document order."""
    kept: List[Block] = []
    for b in blocks:
        if not b.text:
            continue
        if b.bp:
            if b.link_density < cfg.bp_rescue_link_density and b.n_words >= cfg.bp_rescue_min_words:
                kept.append(b)
            continue
        if b.kind in HEADING_TAGS:
            kept.append(b)
            continue
        if b.link_density > cfg.bp_link_density_drop and b.n_words < cfg.bp_short_block_words:
            continue
        kept.append(b)
    return kept


def extract_html(
    payload: bytes, cfg: PipelineConfig
) -> Tuple[List[Block], Optional[str], List[HtmlTable]]:
    """Decode + parse + classify. Returns (kept_blocks, title, tables)."""
    text = payload.decode("utf-8", errors="replace")
    if text.startswith("\ufeff"):
        text = text[1:]
    blocks, title, tables = parse_html_blocks(text, cfg)
    kept = classify_blocks(blocks, cfg)
    if title is None:
        for b in kept:
            if b.kind == "h1":
                title = b.text
                break
    return kept, title, tables
