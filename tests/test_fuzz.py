"""Property-based fuzzing: extract_row must NEVER raise and must uphold
the structural invariants for ARBITRARY payload bytes — web-scale inputs
are adversarial by default (ref precedent: injured-document detection and
recursion workarounds, ``processes.py:47-61``, ``tasks.py:72-81``)."""
import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from text_extraction_system_ray.extract import extract_row
from text_extraction_system_ray.functions.segment import sentence_spans

_SETTINGS = dict(max_examples=150, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _check_invariants(r):
    assert r["status"] in ("ok", "error")
    assert r["char_spans"].shape == (len(r["text"]), 4)
    assert "\x00" not in r["text"]
    pos = 0
    for p in r["pages"]:
        assert p["start"] == pos
        pos = p["end"]
    assert pos == len(r["text"])
    for coll in ("sentences", "paragraphs"):
        for s in r[coll]:
            assert 0 <= s["start"] <= s["end"] <= len(r["text"])


@given(st.binary(max_size=4096))
@settings(**_SETTINGS)
def test_arbitrary_bytes_never_crash(payload):
    _check_invariants(extract_row("u", payload))


@given(st.text(max_size=2048))
@settings(**_SETTINGS)
def test_arbitrary_text_as_html(text):
    _check_invariants(extract_row("u", text.encode("utf-8", "ignore")))


_TAGS = st.sampled_from(["p", "div", "span", "a", "b", "h1", "h2", "li",
                         "table", "tr", "td", "pre", "br", "script",
                         "nav", "footer", "title", "zzz"])


@st.composite
def _html_soup(draw):
    parts = []
    for _ in range(draw(st.integers(0, 30))):
        kind = draw(st.integers(0, 3))
        tag = draw(_TAGS)
        if kind == 0:
            parts.append(f"<{tag}>")
        elif kind == 1:
            parts.append(f"</{tag}>")
        elif kind == 2:
            parts.append(draw(st.text(max_size=40)))
        else:
            parts.append(f"<{tag} class='{draw(st.text(max_size=10))}'>")
    return "".join(parts)


@given(_html_soup())
@settings(**_SETTINGS)
def test_malformed_html_soup(html):
    r = extract_row("u", html.encode("utf-8", "ignore"))
    _check_invariants(r)
    # determinism under fuzz
    r2 = extract_row("u", html.encode("utf-8", "ignore"))
    assert r["text"] == r2["text"]


@given(st.binary(min_size=5, max_size=2048).map(lambda b: b"%PDF-" + b))
@settings(**_SETTINGS)
def test_pdf_magic_fuzz(payload):
    _check_invariants(extract_row("u", payload))


@given(st.text(max_size=500))
@settings(**_SETTINGS)
def test_sentence_spans_bounds(text):
    for s, e in sentence_spans(text):
        assert 0 <= s < e <= len(text)
        assert not text[s].isspace() and not text[e - 1].isspace()


def test_mutated_font_pdfs_never_crash():
    """r2 surface fuzz: random byte mutations / truncations of valid
    real-font PDFs (Widths, ToUnicode CMaps, Flate/A85/LZW streams,
    rotated Tm) must always produce a row — ok or error, never an
    exception, always deterministic."""
    import random

    from text_extraction_system_ray.functions.pdf_fontgen import (
        build_realfont_pdf)
    from tests.test_pdf_fonts import (CMAP, DESCRIPTOR, WIDTHS_FONT,
                                      simple_font_pdf, stream_obj)

    rng = random.Random(1234)
    bases = [
        build_realfont_pdf("fuzz target text with several words", seed=s)
        for s in range(4)
    ] + [simple_font_pdf(b"BT /F5 10 Tf 72 700 Td (ABC) Tj ET",
                         WIDTHS_FONT,
                         {6: DESCRIPTOR, 7: stream_obj(b"", CMAP)})]
    n_ok = n_err = 0
    for i in range(300):
        base = bytearray(bases[i % len(bases)])
        mode = i % 3
        if mode == 0:     # byte flips
            for _ in range(rng.randrange(1, 8)):
                base[rng.randrange(len(base))] = rng.randrange(256)
            payload = bytes(base)
        elif mode == 1:   # truncation
            payload = bytes(base[:rng.randrange(16, len(base))])
        else:             # splice of two PDFs
            other = bases[(i + 1) % len(bases)]
            cut = rng.randrange(len(base))
            payload = bytes(base[:cut]) + other[cut % len(other):]
        r1 = extract_row(f"fz{i}", payload)
        r2 = extract_row(f"fz{i}", payload)
        assert r1["status"] in ("ok", "error")
        assert r1["text"] == r2["text"]            # deterministic
        assert len(r1["char_spans"]) == len(r1["text"])
        n_ok += r1["status"] == "ok"
        n_err += r1["status"] == "error"
    assert n_ok > 0 and n_err > 0    # fuzz hit both paths


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=400))
def test_png_decoder_never_crashes_on_junk(payload):
    """Arbitrary bytes (with or without a forged PNG signature) must
    raise ValueError/NotImplementedError, never crash or hang."""
    from text_extraction_system_ray.functions.png import (PNG_SIGNATURE,
                                                          decode_png)
    for data in (payload, PNG_SIGNATURE + payload):
        try:
            decode_png(data)
        except ValueError:
            pass


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([None, 2, 3, 4]), st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(w, h, ch, seed):
    import numpy as np
    from text_extraction_system_ray.functions.png import (decode_png,
                                                          encode_png)
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=300))
def test_stream_data_never_crashes(body):
    """_stream_data on arbitrary object bodies: returns bytes or None,
    never raises (the extractor wraps it per stream)."""
    from text_extraction_system_ray.functions.pdf_extract import _stream_data
    out = _stream_data(b"<< /Length 12 0 R >>\nstream\n" + body +
                       b"\nendstream")
    assert out is None or isinstance(out, bytes)
    _stream_data(body)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=300))
def test_jpeg_decoder_never_crashes_on_junk(payload):
    from text_extraction_system_ray.functions.jpeg import decode_jpeg
    for data in (payload, b"\xff\xd8" + payload):
        try:
            decode_jpeg(data)
        except (ValueError, NotImplementedError):
            pass


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=300))
def test_gif_decoder_never_crashes_on_junk(payload):
    from text_extraction_system_ray.functions.gif import decode_gif
    for data in (payload, b"GIF89a" + payload):
        try:
            decode_gif(data)
        except ValueError:
            pass
