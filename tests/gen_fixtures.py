"""Deterministic synthetic pages corpus (FIXTURES.md spec, seed=42).

Row families keyed by url prefix; each family exercises a branch of the
extraction contract — translated from the reference's binary fixture corpus
(``/root/reference/.../tests/data/``, SURVEY.md §5.1) to table rows.

Usable as a library (``generate_corpus(scale)`` → pyarrow.Table) or a CLI
(``python tests/gen_fixtures.py tiny /tmp/pages``).
"""
from __future__ import annotations

import datetime as dt
import random
import sys
from typing import List

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from text_extraction_system_ray.functions.pdf_build import build_pdf  # noqa: E402
from text_extraction_system_ray.schema import PAGES_SCHEMA  # noqa: E402

SEED = 42
_EPOCH = dt.datetime(2021, 1, 1)

_LOREM = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua").split()

_LANG_SENTENCES = {
    "en": "The quick brown fox jumps over the lazy dog near the river bank.",
    "de": "Der schnelle braune Fuchs springt über den faulen Hund und die Wiese ist grün.",
    "ru": "Быстрая коричневая лиса прыгает через ленивую собаку возле реки.",
    "uk": "Швидка коричнева лисиця стрибає через ледачого пса біля річки її хвіст рудий.",
    "fr": "Le renard brun rapide saute par dessus le chien paresseux près de la rivière.",
    "es": "El rápido zorro marrón salta sobre el perro perezoso cerca del río.",
}

_NAV = ('<nav><a href="/">Home</a> <a href="/a">Products</a> '
        '<a href="/b">Blog</a> <a href="/c">Contact</a></nav>')
_SIDEBAR = ('<div class="sidebar"><a href="/p1">Popular post one</a> '
            '<a href="/p2">Popular post two</a> <a href="/p3">Another link</a></div>')
_FOOTER = ('<footer>Copyright 2021 <a href="/terms">Terms of Service</a> '
           '<a href="/privacy">Privacy</a></footer>')


def _sent(rng: random.Random, j: int, i: int) -> str:
    extra = " ".join(rng.choice(_LOREM) for _ in range(rng.randint(3, 9)))
    return f"This is sentence {j} of page {i} with {extra}."


def _wrap(body: str, title: str = "") -> bytes:
    t = f"<title>{title}</title>" if title else ""
    return (f"<html><head>{t}</head><body>{_NAV}{_SIDEBAR}"
            f"<article>{body}</article>{_FOOTER}</body></html>").encode("utf-8")


def _rows_plain(rng: random.Random, n: int) -> List[dict]:
    rows = []
    for i in range(n):
        k_paras = rng.randint(2, 6)
        paras = []
        for p in range(k_paras):
            sents = " ".join(_sent(rng, p * 3 + j, i) for j in range(3))
            paras.append(f"<p>{sents}</p>")
        rows.append({"url": f"https://test.example/plain/{i:06d}",
                     "html": _wrap("".join(paras), f"Plain {i}"), "lang": ""})
    return rows


def _rows_paged(rng: random.Random, n: int) -> List[dict]:
    rows = []
    for i in range(n):
        body = [f"<h1>Paged document {i}</h1>"]
        for s in range(rng.randint(2, 4)):
            body.append(f"<h2>Chapter {s}</h2>")
            for ss in range(rng.randint(1, 3)):
                body.append(f"<h3>Section {s}.{ss}</h3>")
                body.append(f"<p>This is page {s * 3 + ss}. "
                            f"{_sent(rng, ss, i)}</p>")
        rows.append({"url": f"https://test.example/paged/{i:06d}",
                     "html": _wrap("".join(body)), "lang": ""})
    return rows


def _rows_multilang(rng: random.Random, n: int) -> List[dict]:
    rows = []
    codes = list(_LANG_SENTENCES)
    for i in range(n):
        body = []
        for j, code in enumerate(codes):
            s = _LANG_SENTENCES[code]
            body.append(f"<p>{s} {s}</p>")
        # half the rows carry a forced hint
        hint = "en" if i % 2 == 0 else ""
        rows.append({"url": f"https://test.example/multilang/{i:06d}",
                     "html": _wrap("".join(body)), "lang": hint})
    return rows


def _rows_empty(n: int) -> List[dict]:
    variants = [
        b"",
        _wrap(""),  # boilerplate only, no main content
        b"<html><body>   \n\t  </body></html>",
        b"<html><body><nav><a href='/'>x</a><a href='/y'>y</a></nav></body></html>",
    ]
    return [{"url": f"https://test.example/empty/{i:06d}",
             "html": variants[i % len(variants)], "lang": ""} for i in range(n)]


def _rows_nul(rng: random.Random, n: int) -> List[dict]:
    rows = []
    for i in range(n):
        body = (f"<p>Before\x00NUL {_sent(rng, 0, i)}</p>"
                f"<p>Ctrl\x01\x02chars {_sent(rng, 1, i)}</p>")
        rows.append({"url": f"https://test.example/nul/{i:06d}",
                     "html": _wrap(body), "lang": ""})
    return rows


def _rows_entities(rng: random.Random, n: int) -> List[dict]:
    variants = [
        "<p>Fish &amp; chips &lt;tag&gt; &#65;&#x42; &quot;quoted&quot;</p>",
        "<p>Line one<br>Line two<br/>Line three</p>",
        "<pre>  code line 1\n  code line 2\n</pre>",
        "<p>Nested <b>bold <i>italic</i></b> inline</p>",
        "<p>Unclosed <b>tag <p>next para",
        "<!-- comment --><p>After comment</p>",
        "<p>Non&nbsp;breaking&nbsp;space</p>",
        "<p>Mal<formed attr='x>text here</p>",
    ]
    return [{"url": f"https://test.example/entities/{i:06d}",
             "html": _wrap(variants[i % len(variants)] + f"<p>{_sent(rng, 9, i)}</p>"),
             "lang": ""} for i in range(n)]


def _rows_giant(rng: random.Random, n: int) -> List[dict]:
    rows = []
    # one ~1 MB many-section HTML
    body = []
    for s in range(400):
        body.append(f"<h2>Giant section {s}</h2>")
        body.append("<p>" + " ".join(_sent(rng, j, s) for j in range(5)) + "</p>")
    rows.append({"url": "https://test.example/giant/000000",
                 "html": _wrap("".join(body)), "lang": ""})
    if n > 1:
        # one giant multi-page PDF (drives the page-split skew path)
        pages = []
        for p in range(40):
            pages.append([f"Giant pdf page {p} line {ln} " + " ".join(
                rng.choice(_LOREM) for _ in range(5)) for ln in range(30)])
        rows.append({"url": "https://test.example/giant/000001",
                     "html": build_pdf(pages), "lang": ""})
    return rows[:n]


def _rows_pdfish(rng: random.Random, n: int) -> List[dict]:
    rows = []
    for i in range(n):
        if i % 4 == 3:
            # image-only page (needs-OCR analog of ocr1.pdf)
            payload = build_pdf([["Text page one."], []], image_pages=[2])
        elif i % 4 == 2:
            payload = build_pdf(
                [[f"Compressed doc {i} line {j}." for j in range(5)]],
                compress=True)
        else:
            payload = build_pdf(
                [[f"Pdf doc {i} page 1 line {j}." for j in range(4)],
                 [f"Pdf doc {i} page 2 line {j}." for j in range(3)]],
                rotations=[0, 90] if i % 2 else None)
        rows.append({"url": f"https://test.example/pdfish/{i:06d}",
                     "html": payload, "lang": ""})
    return rows


def _rows_poison(n: int) -> List[dict]:
    deep = b"<div>" * 10000 + b"deep text" + b"</div>" * 10000
    many_attrs = ("<p " + " ".join(f"a{i}='x'" for i in range(5000)) + ">attrs</p>").encode()
    variants = [
        b"<html><body>" + deep + b"</body></html>",
        b"<html><body>" + many_attrs + b"</body></html>",
        b"%PDF-1.4\ntruncated",
        bytes(range(256)) * 64,
    ]
    return [{"url": f"https://test.example/poison/{i:06d}",
             "html": variants[i % len(variants)], "lang": ""} for i in range(n)]


def _rows_images(n: int) -> List[dict]:
    """Raw image payloads (M1 image intake): PNG / JPEG / GIF rotate
    through the rows; deterministic pixels from numpy seeds."""
    import numpy as np
    from text_extraction_system_ray.functions.gif import is_gif  # noqa
    from text_extraction_system_ray.functions.jpeg import encode_jpeg
    from text_extraction_system_ray.functions.png import encode_png

    def gif_payload(seed: int) -> bytes:
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, 4, size=(8, 8)).astype(np.uint8)
        palette = bytes(rng.randint(0, 256, size=12, dtype=np.int64)
                        .astype(np.uint8))
        codes = bytearray()
        # literal codes with CLEAR between each (fixed 3-bit width)
        bits = []
        for p in idx.reshape(-1):
            bits += [(4, 3), (int(p), 3)]
        bits.append((5, 3))
        acc = nacc = 0
        for val, w in bits:
            acc |= (val & 7) << nacc
            nacc += w
            while nacc >= 8:
                codes.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        if nacc:
            codes.append(acc & 0xFF)
        blob = b"GIF89a" + (8).to_bytes(2, "little") * 2 + \
            bytes([0x81, 0, 0]) + palette + \
            b"\x2c" + bytes(4) + (8).to_bytes(2, "little") * 2 + b"\x00" + \
            bytes([2])
        body = bytes(codes)
        for i in range(0, len(body), 255):
            chunk = body[i:i + 255]
            blob += bytes([len(chunk)]) + chunk
        return blob + b"\x00\x3b"

    out = []
    for i in range(n):
        rng = np.random.RandomState(1000 + i)
        img = np.full((48, 64), 255, np.uint8)
        for y0 in range(6, 42, 8):
            img[y0:y0 + 3, 4:60] = 0
        if i % 5 == 3:
            from text_extraction_system_ray.functions.tiff import \
                encode_tiff
            payload = encode_tiff(img, compression=5, predictor=2)
        elif i % 5 == 4:
            from text_extraction_system_ray.functions.webp import \
                encode_webp_lossless
            payload = encode_webp_lossless(img)
        elif i % 3 == 0:
            payload = encode_png(img)
        elif i % 3 == 1:
            payload = encode_jpeg(img)
        else:
            payload = gif_payload(i)
        out.append({"url": f"https://test.example/image/{i:06d}",
                    "html": payload, "lang": ""})
    return out


def _rows_dup(rng: random.Random, n: int) -> List[dict]:
    payload = _wrap(f"<p>{_sent(rng, 0, 0)}</p>")
    return [{"url": "https://test.example/dup/000000", "html": payload,
             "lang": ""} for _ in range(n)]


_SCALES = {"tiny": 1, "small": 16, "bench": 400}


def generate_corpus(scale: str = "tiny") -> pa.Table:
    mult = _SCALES[scale]
    rng = random.Random(SEED)
    rows: List[dict] = []
    rows += _rows_plain(rng, 16 * mult)
    rows += _rows_paged(rng, 8 * mult)
    rows += _rows_multilang(rng, 8 * mult)
    rows += _rows_empty(4 * mult)
    rows += _rows_nul(rng, 4 * mult)
    rows += _rows_entities(rng, 8 * mult)
    rows += _rows_giant(rng, 2)
    rows += _rows_pdfish(rng, 8 * mult)
    rows += _rows_poison(4)
    rows += _rows_images(5)
    rows += _rows_dup(rng, 2)
    for i, r in enumerate(rows):
        r["warc_ts"] = _EPOCH + dt.timedelta(seconds=i)
        r.setdefault("text", "")
    return pa.table(
        {"url": [r["url"] for r in rows],
         "warc_ts": [r["warc_ts"] for r in rows],
         "html": [r["html"] for r in rows],
         "text": [r["text"] for r in rows],
         "lang": [r["lang"] for r in rows]},
        schema=PAGES_SCHEMA)


def write_corpus(scale: str, out_path: str) -> str:
    tbl = generate_corpus(scale)
    pq.write_table(tbl, out_path, row_group_size=256)
    return out_path


if __name__ == "__main__":
    scale = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/pages_{scale}.parquet"
    print(write_corpus(scale, out))
