"""RFC 3986 §5 reference resolution, from scratch.

Real-crawl hrefs are mostly relative; building a link graph requires
resolving each against the page URL (plus any ``<base href>``). This is
the spec's strict algorithm — §5.2.2 transform references, §5.2.3 path
merge, §5.2.4 remove_dot_segments — validated against the RFC's own
§5.4 normal AND abnormal example tables in tests/test_urlresolve.py.
"""
from __future__ import annotations

import re
from typing import NamedTuple, Optional


class Parts(NamedTuple):
    scheme: Optional[str]
    authority: Optional[str]
    path: str
    query: Optional[str]
    fragment: Optional[str]


_URI_RE = re.compile(
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*):)?"
    r"(?://(?P<authority>[^/?#]*))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$",
    re.DOTALL)


def split_uri(ref: str) -> Parts:
    m = _URI_RE.match(ref)
    return Parts(m.group("scheme"), m.group("authority"), m.group("path"),
                 m.group("query"), m.group("fragment"))


def remove_dot_segments(path: str) -> str:
    """§5.2.4 — literal implementation of the input/output buffer walk."""
    out: list = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                i = path.find("/", 1)
            else:
                i = path.find("/")
            if i < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _merge(base: Parts, ref_path: str) -> str:
    """§5.2.3."""
    if base.authority is not None and base.path == "":
        return "/" + ref_path
    i = base.path.rfind("/")
    return (base.path[:i + 1] + ref_path) if i >= 0 else ref_path


def _recompose(p: Parts) -> str:
    out = []
    if p.scheme is not None:
        out.append(p.scheme + ":")
    if p.authority is not None:
        out.append("//" + p.authority)
    out.append(p.path)
    if p.query is not None:
        out.append("?" + p.query)
    if p.fragment is not None:
        out.append("#" + p.fragment)
    return "".join(out)


def resolve(base: str, ref: str) -> str:
    """§5.2.2 strict-mode transform (a same-scheme ref is NOT treated
    as relative — per the spec's non-strict note)."""
    b = split_uri(base)
    r = split_uri(ref)
    if r.scheme is not None:
        t = Parts(r.scheme, r.authority, remove_dot_segments(r.path),
                  r.query, r.fragment)
    elif r.authority is not None:
        t = Parts(b.scheme, r.authority, remove_dot_segments(r.path),
                  r.query, r.fragment)
    elif r.path == "":
        t = Parts(b.scheme, b.authority, b.path,
                  r.query if r.query is not None else b.query, r.fragment)
    elif r.path.startswith("/"):
        t = Parts(b.scheme, b.authority, remove_dot_segments(r.path),
                  r.query, r.fragment)
    else:
        t = Parts(b.scheme, b.authority,
                  remove_dot_segments(_merge(b, r.path)),
                  r.query, r.fragment)
    return _recompose(t)
