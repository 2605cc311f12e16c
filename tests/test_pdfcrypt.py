"""Standard-security-handler PDF encryption/decryption (PDF 32000-1
§7.6) — spec-anchored cipher vectors, password algorithms, and
byte-identical extraction round-trips through all three methods."""
import numpy as np
import pytest

from text_extraction_system_ray.config import PipelineConfig
from text_extraction_system_ray.functions import pdfcrypt as C
from text_extraction_system_ray.functions.pdf_build import build_pdf
from text_extraction_system_ray.functions.pdf_extract import (
    ExtractError, extract_pdf_full)


def _full(payload, cfg):
    pages, toc = extract_pdf_full(payload, cfg)
    chars = [c for p in pages for b in p.blocks for ln in b.lines
             for c in ln]
    return ("".join(c.ch for c in chars),
            [tuple(round(v, 2) for v in c.bbox) for c in chars], toc)


@pytest.fixture(scope="module")
def fixture_pdf():
    return build_pdf(
        [["Hello encrypted world", "line two of page"], ["page 2 text"]],
        compress=True,
        outlines=[{"title": "Sec 1", "page": 1, "level": 1,
                   "x": 72, "y": 720}])


def test_aes128_fips197_vector():
    # FIPS-197 Appendix C.1 known-answer
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = C._expand_key(key)
    ct = C._aes_encrypt_blocks(
        np.frombuffer(pt, np.uint8)[None, :], rk)[0].tobytes()
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert C._aes_decrypt_blocks(
        np.frombuffer(ct, np.uint8)[None, :], rk)[0].tobytes() == pt


def test_aes_cbc_round_trip_all_lengths():
    key = b"0123456789abcdef"
    iv = b"fedcba9876543210"
    for n in (0, 1, 15, 16, 17, 31, 32, 1000):
        data = bytes(range(256)) * 4
        data = data[:n]
        enc = C.aes128_cbc_encrypt(key, iv, data)
        assert len(enc) % 16 == 0 and len(enc) > len(data) - 16
        assert C.aes128_cbc_decrypt(key, iv, enc) == data


def test_rc4_known_vector():
    # RFC 6229-style vector: key "Key", plaintext "Plaintext"
    assert C.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    # involutive
    assert C.rc4(b"Key", C.rc4(b"Key", b"data123")) == b"data123"


@pytest.mark.parametrize("method", ["rc4-40", "rc4-128", "aesv2"])
@pytest.mark.parametrize("pw", ["", "sekrit"])
def test_roundtrip_byte_identical(fixture_pdf, method, pw):
    base = _full(fixture_pdf, PipelineConfig())
    enc = C.encrypt_pdf(fixture_pdf, user_pw=pw, method=method)
    assert enc != fixture_pdf
    assert b"/Encrypt" in enc
    got = _full(enc, PipelineConfig(pdf_password=pw))
    assert got == base          # text, char boxes AND outline titles


def test_wrong_password_fails_cleanly(fixture_pdf):
    enc = C.encrypt_pdf(fixture_pdf, user_pw="right", method="rc4-128")
    with pytest.raises(ExtractError, match="password"):
        _full(enc, PipelineConfig(pdf_password="wrong"))
    with pytest.raises(ExtractError, match="password"):
        _full(enc, PipelineConfig())            # missing password


def test_owner_password_opens(fixture_pdf):
    base = _full(fixture_pdf, PipelineConfig())
    for method in ("rc4-128", "aesv2"):
        enc = C.encrypt_pdf(fixture_pdf, user_pw="u1", owner_pw="own",
                            method=method)
        assert _full(enc, PipelineConfig(pdf_password="own")) == base
        assert _full(enc, PipelineConfig(pdf_password="u1")) == base


def test_corpus_plants_encrypted_rows(ray_session):
    """The synthetic pages corpus carries owner-locked (empty user
    password) encrypted PDFs — the flagship path decrypts them and the
    extracted text is byte-identical to the plaintext build."""
    import pyarrow.parquet as pq
    from text_extraction_system_ray.sources.pages import (
        doc_to_page_pdf, pages_parquet)
    pages = pq.read_table(pages_parquet("/root/testdata/sf0.001"),
                          columns=["url", "html"])
    enc_rows = [(u, p) for u, p in zip(pages["url"].to_pylist(),
                                       pages["html"].to_pylist())
                if p.startswith(b"%PDF") and b"/Encrypt" in p]
    assert enc_rows, "no encrypted PDFs planted"
    from text_extraction_system_ray.functions.pdf_extract import (
        extract_pdf)
    cfg = PipelineConfig()
    import pyarrow.parquet  # noqa: F401
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    text_of = dict(zip(docs["doc_id"].to_pylist(),
                       docs["text"].to_pylist()))
    for url, payload in enc_rows[:4]:
        doc_id = int(url[-8:])
        plain = doc_to_page_pdf(doc_id, text_of[doc_id] or "")
        a = extract_pdf(payload, cfg)
        b = extract_pdf(plain, cfg)
        ta = "".join(c.ch for p in a for blk in p.blocks
                     for ln in blk.lines for c in ln)
        tb = "".join(c.ch for p in b for blk in p.blocks
                     for ln in blk.lines for c in ln)
        assert ta == tb and ta


def test_string_span_scanner_handles_nesting_and_escapes():
    body = rb"""<< /T (lit (nested) \) esc) /H <48656c6c6f> /D << /X 1 >>
                /S (tr\\ailing) >>"""
    spans = list(C._find_string_spans(body))
    texts = [body[a:b] for a, b in spans]
    assert texts[0] == rb"(lit (nested) \) esc)"
    assert texts[1] == b"<48656c6c6f>"
    assert texts[2] == rb"(tr\\ailing)"
    assert C._pdf_string_bytes(texts[1]) == b"Hello"
    assert C._pdf_string_bytes(texts[0]) == b"lit (nested) ) esc"


def test_pdf_string_bytes_escapes_and_octal():
    assert C._pdf_string_bytes(rb"(a\tb\nc)") == b"a\tb\nc"
    assert C._pdf_string_bytes(rb"(\101\102\7)") == b"AB\x07"
    assert C._pdf_string_bytes(b"<4 1 4 2>") == b"AB"   # ws in hex
    assert C._pdf_string_bytes(b"<414>") == b"A@"       # odd → pad 0


def test_to_literal_roundtrip_arbitrary_bytes():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=64))
    def roundtrip(bs):
        lit = C._to_literal(bs)
        assert C._pdf_string_bytes(lit) == bs
        # the literal must also be re-scannable as exactly one span
        spans = list(C._find_string_spans(lit))
        assert spans == [(0, len(lit))]

    roundtrip()


def test_encrypt_decrypt_string_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(st.binary(min_size=0, max_size=100),
           st.sampled_from(["rc4-40", "rc4-128", "aesv2"]))
    def roundtrip(data, method):
        keylen = {"rc4-40": 5, "rc4-128": 16, "aesv2": 16}[method]
        key = bytes(range(1, keylen + 1))
        ok = C.object_key(key, 7, 0, method == "aesv2")
        if method == "aesv2":
            iv = b"\x11" * 16
            enc = iv + C.aes128_cbc_encrypt(ok, iv, data)
            dec = C.aes128_cbc_decrypt(ok, enc[:16], enc[16:])
        else:
            dec = C.rc4(ok, C.rc4(ok, data))
        assert dec == data

    roundtrip()


def test_generation_numbers_feed_object_keys():
    """Algorithm 1 keys on (num, gen): a payload whose objects carry
    gen > 0 must round-trip — and the gen-0 key must NOT decrypt it.
    (Uncompressed build so the header rewrite can't touch binary
    stream bytes.)"""
    import re
    plain = build_pdf([["gen three object text"]], compress=False)
    bumped = re.sub(rb"(\d+)\s+0\s+obj", rb"\1 3 obj", plain)
    bumped = re.sub(rb"(\d+)\s+0\s+R", rb"\1 3 R", bumped)
    base = _full(bumped, PipelineConfig())
    assert "gen three" in base[0]
    enc = C.encrypt_pdf(bumped, user_pw="", method="rc4-128")
    assert _full(enc, PipelineConfig()) == base
    # sanity: keys for gen 0 and gen 3 differ
    k = b"0123456789abcdef"
    assert C.object_key(k, 5, 0, False) != C.object_key(k, 5, 3, False)
