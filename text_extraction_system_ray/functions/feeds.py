"""RSS 2.0 / Atom feed parsing — crawl pipelines ingest feeds alongside
pages (discovery + freshness signals). Both formats are public specs
(RSS 2.0 @ Harvard Berkman, RFC 4287 Atom); parsing is stdlib
ElementTree, dates via ``email.utils`` (RFC 822, RSS) and
``datetime.fromisoformat`` (RFC 3339, Atom).

Builders emit deterministic spec-valid feeds for fixtures; the parser
is format-sniffing (``<rss>`` root vs Atom-namespace ``<feed>``) and
tolerant of missing fields (None-filled, never raises on a bad item).
"""
from __future__ import annotations

import datetime as _dt
import email.utils as _eut
from typing import List, Optional, Tuple
from xml.etree import ElementTree

_ATOM = "{http://www.w3.org/2005/Atom}"

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def build_rss(channel_title: str,
              items: List[Tuple[str, str, _dt.datetime]]) -> bytes:
    from .office import xml_escape as esc
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<rss version="2.0"><channel>',
             f"<title>{esc(channel_title)}</title>",
             "<link>https://example.org/</link>",
             "<description>fixture feed</description>"]
    for title, link, ts in items:
        parts.append(
            "<item>"
            f"<title>{esc(title)}</title>"
            f"<link>{esc(link)}</link>"
            f"<pubDate>{_eut.format_datetime(ts)}</pubDate>"
            "</item>")
    parts.append("</channel></rss>")
    return "".join(parts).encode("utf-8")


def build_atom(feed_title: str,
               items: List[Tuple[str, str, _dt.datetime]]) -> bytes:
    from .office import xml_escape as esc
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<feed xmlns="http://www.w3.org/2005/Atom">',
             f"<title>{esc(feed_title)}</title>",
             "<id>urn:fixture</id>",
             f"<updated>{items[0][2].isoformat() if items else '1970-01-01T00:00:00+00:00'}</updated>"]
    for title, link, ts in items:
        parts.append(
            "<entry>"
            f"<title>{esc(title)}</title>"
            f'<link href="{esc(link, attr=True)}"/>'
            f"<id>urn:item:{esc(link)}</id>"
            f"<updated>{ts.isoformat()}</updated>"
            "</entry>")
    parts.append("</feed>")
    return "".join(parts).encode("utf-8")


def parse_feed(payload: bytes) -> Optional[dict]:
    """→ {feed_type: 'rss'|'atom', title, items: [(title, link,
    ts | None)]} or None if the payload is not a feed."""
    try:
        root = ElementTree.fromstring(payload)
    except ElementTree.ParseError:
        return None
    if root.tag == "rss":
        ch = root.find("channel")
        if ch is None:
            return None
        items = []
        for it in ch.findall("item"):
            t = it.findtext("title")
            ln = it.findtext("link")
            ts = None
            pd = it.findtext("pubDate")
            if pd:
                try:
                    ts = _eut.parsedate_to_datetime(pd)
                except (TypeError, ValueError):
                    ts = None
            items.append((t, ln, ts))
        return {"feed_type": "rss", "title": ch.findtext("title"),
                "items": items}
    if root.tag == f"{_ATOM}feed":
        items = []
        for it in root.findall(f"{_ATOM}entry"):
            t = it.findtext(f"{_ATOM}title")
            lk = it.find(f"{_ATOM}link")
            ln = lk.get("href") if lk is not None else None
            ts = None
            up = it.findtext(f"{_ATOM}updated")
            if up:
                try:
                    ts = _dt.datetime.fromisoformat(up)
                except ValueError:
                    ts = None
            items.append((t, ln, ts))
        return {"feed_type": "atom",
                "title": root.findtext(f"{_ATOM}title"), "items": items}
    return None


def feed_item_day(ts: Optional[_dt.datetime]) -> int:
    """Days since the Unix epoch (UTC) — the arithmetic the oracle can
    recompute; -1 for missing dates."""
    if ts is None:
        return -1
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return int((ts - _EPOCH).total_seconds() // 86400)
