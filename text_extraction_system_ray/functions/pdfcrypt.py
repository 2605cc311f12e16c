"""PDF standard security handler (PDF 32000-1 §7.6) — from scratch.

Reference parity: the reference threads ``pdf_password`` through its
whole API (``web_api.py:68-94``) and hands it to PDFBox
(``GetTextFromPDF.java:23-98``, ``document.openProtection``). This
module implements the same contract natively: RC4 (40/128-bit, V=1/2,
R=2/3) and AES-128-CBC (/AESV2, V=4 R=4) decryption of strings and
streams, password authentication against /U (Algorithms 2, 4, 5), and
— because no PDF library exists in this environment — the matching
ENCRYPTION side so fixtures can be built (Algorithm 3 for /O).

Everything here derives from the published PDF 32000-1 spec and FIPS
197 (AES); the AES block cipher is vectorized over all blocks of a
stream with numpy (CBC decryption parallelizes: ECB-decrypt every
block, then XOR with the previous ciphertext block).
"""
from __future__ import annotations

import hashlib
import re
import struct
from typing import Dict, Optional, Tuple

import numpy as np

# §7.6.3.3 Algorithm 2: the 32-byte password padding string
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


# --------------------------------------------------------------- RC4

def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------- AES-128 (FIPS 197)

def _build_sbox() -> Tuple[np.ndarray, np.ndarray]:
    # multiplicative inverse in GF(2^8) via log/antilog over generator 3
    exp = np.zeros(512, np.uint8)
    log = np.zeros(256, np.int32)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    exp[255:510] = exp[0:255]
    inv = np.zeros(256, np.uint8)
    for a in range(1, 256):
        inv[a] = exp[255 - log[a]]
    sbox = np.zeros(256, np.uint8)
    for a in range(256):
        b = int(inv[a])
        s = b
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        sbox[a] = s ^ 0x63
    isbox = np.zeros(256, np.uint8)
    isbox[sbox] = np.arange(256, dtype=np.uint8)
    return sbox, isbox


_SBOX, _ISBOX = _build_sbox()


def _gmul_table(c: int) -> np.ndarray:
    t = np.zeros(256, np.uint8)
    for a in range(256):
        r, b, cc = 0, a, c
        while cc:
            if cc & 1:
                r ^= b
            b = ((b << 1) ^ (0x11B if b & 0x80 else 0)) & 0xFF
            cc >>= 1
        t[a] = r
    return t


_M2, _M3 = _gmul_table(2), _gmul_table(3)
_M9, _M11, _M13, _M14 = (_gmul_table(9), _gmul_table(11),
                         _gmul_table(13), _gmul_table(14))
# state layout: (N, 16) row-major by column (byte i = col i//4, row i%4)
_SHIFT = np.array([0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11])
_INV_SHIFT = np.argsort(_SHIFT)
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> np.ndarray:
    """176-byte AES-128 key schedule → (11, 16) uint8."""
    w = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    flat = np.array([b for word in w for b in word], np.uint8)
    return flat.reshape(11, 16)


def _mix_columns(s: np.ndarray) -> np.ndarray:
    v = s.reshape(-1, 4, 4)            # (N, col, row)
    a0, a1, a2, a3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    r = np.empty_like(v)
    r[:, :, 0] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
    r[:, :, 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
    r[:, :, 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
    r[:, :, 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
    return r.reshape(-1, 16)


def _inv_mix_columns(s: np.ndarray) -> np.ndarray:
    v = s.reshape(-1, 4, 4)
    a0, a1, a2, a3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    r = np.empty_like(v)
    r[:, :, 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
    r[:, :, 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
    r[:, :, 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
    r[:, :, 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    return r.reshape(-1, 16)


def _aes_encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    s = blocks ^ rk[0]
    for rnd in range(1, 10):
        s = _SBOX[s][:, _SHIFT]
        s = _mix_columns(s) ^ rk[rnd]
    s = _SBOX[s][:, _SHIFT] ^ rk[10]
    return s


def _aes_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    s = blocks ^ rk[10]
    for rnd in range(9, 0, -1):
        s = _ISBOX[s[:, _INV_SHIFT]] ^ rk[rnd]
        s = _inv_mix_columns(s)
    return _ISBOX[s[:, _INV_SHIFT]] ^ rk[0]


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PKCS#5-style 16-byte padding, as the PDF AESV2 scheme requires."""
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    rk = _expand_key(key)
    blocks = np.frombuffer(data, np.uint8).reshape(-1, 16)
    out = np.empty_like(blocks)
    prev = np.frombuffer(iv, np.uint8)
    for i in range(len(blocks)):          # CBC encryption is sequential
        prev = _aes_encrypt_blocks((blocks[i] ^ prev)[None, :], rk)[0]
        out[i] = prev
    return out.tobytes()


def aes128_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16 or not data:
        raise ValueError("AES-CBC ciphertext not block-aligned")
    rk = _expand_key(key)
    blocks = np.frombuffer(data, np.uint8).reshape(-1, 16)
    plain = _aes_decrypt_blocks(blocks, rk)
    prev = np.vstack([np.frombuffer(iv, np.uint8)[None, :], blocks[:-1]])
    out = (plain ^ prev).tobytes()
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("AES-CBC bad padding")
    return out[:-pad]


# ---------------------------------------- standard handler algorithms

def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_owner_entry(owner_pw: bytes, user_pw: bytes, rev: int,
                        keylen: int) -> bytes:
    """Algorithm 3: the /O value."""
    h = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:keylen]
    o = rc4(key, _pad_pw(user_pw))
    if rev >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_file_key(user_pw: bytes, o_entry: bytes, p: int, id0: bytes,
                     rev: int, keylen: int) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_pw(user_pw))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    key = h.digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def compute_user_entry(file_key: bytes, rev: int, id0: bytes) -> bytes:
    """Algorithm 4 (R=2) / Algorithm 5 (R≥3): the /U value."""
    if rev == 2:
        return rc4(file_key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(file_key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16


def authenticate(password: bytes, o_entry: bytes, u_entry: bytes, p: int,
                 id0: bytes, rev: int, keylen: int) -> Optional[bytes]:
    """Try ``password`` as user then owner password (Algorithms 6/7).
    Returns the file key on success, None on failure."""
    key = compute_file_key(password, o_entry, p, id0, rev, keylen)
    want = compute_user_entry(key, rev, id0)
    cmp_len = 32 if rev == 2 else 16
    if want[:cmp_len] == u_entry[:cmp_len]:
        return key
    # owner password path (Algorithm 7): recover the user password
    h = hashlib.md5(_pad_pw(password)).digest()
    if rev >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:keylen]
    user_padded = o_entry
    if rev == 2:
        user_padded = rc4(okey, o_entry)
    else:
        for i in range(19, -1, -1):
            user_padded = rc4(bytes(b ^ i for b in okey), user_padded)
    # user_padded is already padded — hash the raw 32 bytes directly
    # (compute_file_key would pad a second time)
    h2 = hashlib.md5()
    h2.update(user_padded[:32])
    h2.update(o_entry[:32])
    h2.update(struct.pack("<i", p))
    h2.update(id0)
    key = h2.digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    key = key[:keylen]
    want = compute_user_entry(key, rev, id0)
    if want[:cmp_len] == u_entry[:cmp_len]:
        return key
    return None


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1 per-object key (RC4 and AESV2 share it; AESV2 adds
    the sAlT bytes)."""
    ext = struct.pack("<i", num)[:3] + struct.pack("<i", gen)[:2]
    if aes:
        ext += b"\x73\x41\x6C\x54"
    k = hashlib.md5(file_key + ext).digest()
    return k[:min(len(file_key) + 5, 16)]


# -------------------------------------------------- document plumbing

_ENC_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>\s*<([0-9A-Fa-f]*)>\s*\]")


class EncryptionInfo:
    def __init__(self, enc_num: int, v: int, rev: int, keylen: int,
                 o_entry: bytes, u_entry: bytes, p: int, id0: bytes,
                 aes: bool):
        self.enc_num = enc_num
        self.v, self.rev, self.keylen = v, rev, keylen
        self.o_entry, self.u_entry, self.p = o_entry, u_entry, p
        self.id0, self.aes = id0, aes


def _pdf_string_bytes(raw: bytes) -> bytes:
    """Decode one PDF string token (literal with escapes, or hex)."""
    if raw.startswith(b"<"):
        h = re.sub(rb"\s", b"", raw[1:-1])
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii"))
    out = bytearray()
    i = 1
    end = len(raw) - 1
    while i < end:
        c = raw[i]
        if c == 0x5C and i + 1 < end:          # backslash
            n = raw[i + 1]
            esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                   0x28: 40, 0x29: 41, 0x5C: 92}
            if n in esc:
                out.append(esc[n])
                i += 2
                continue
            if 0x30 <= n <= 0x37:              # octal, up to 3 digits
                j = i + 1
                oct_s = b""
                while j < end and len(oct_s) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_s += bytes([raw[j]])
                    j += 1
                out.append(int(oct_s, 8) & 0xFF)
                i = j
                continue
            i += 1                              # line continuation etc.
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _find_string_spans(data: bytes):
    """Yield (start, end) byte spans of string tokens in a dict body —
    literal ``(...)`` with escape/nesting handling and hex ``<...>``
    (``<<`` dict delimiters skipped)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == 0x28:                           # (
            depth, j = 1, i + 1
            while j < n and depth:
                if data[j] == 0x5C:
                    j += 2
                    continue
                if data[j] == 0x28:
                    depth += 1
                elif data[j] == 0x29:
                    depth -= 1
                j += 1
            yield i, j
            i = j
        elif c == 0x3C:                         # <
            if i + 1 < n and data[i + 1] == 0x3C:
                i += 2
                continue
            j = data.find(b">", i + 1)
            if j < 0:
                return
            yield i, j + 1
            i = j + 1
        elif c == 0x3E and i + 1 < n and data[i + 1] == 0x3E:
            i += 2
        else:
            i += 1


def parse_encryption(payload: bytes,
                     objs: Dict[int, bytes]) -> Optional[EncryptionInfo]:
    """Trailer /Encrypt + /ID → EncryptionInfo, or None if unencrypted."""
    m = _ENC_REF_RE.search(payload)
    if m is None:
        return None
    enc_num = int(m.group(1))
    body = objs.get(enc_num)
    if body is None:
        return None
    mid = _ID_RE.search(payload)
    id0 = bytes.fromhex(mid.group(1).decode("ascii")) if mid else b""
    d = body

    def _int(key: bytes, default: int) -> int:
        mm = re.search(key + rb"\s+(-?\d+)", d)
        return int(mm.group(1)) if mm else default

    v = _int(rb"/V", 0)
    rev = _int(rb"/R", 2)
    length = _int(rb"/Length", 40)
    p = _int(rb"/P", -1)
    aes = b"/AESV2" in d
    strings = {}
    for key in (b"O", b"U"):
        mm = re.search(rb"/" + key + rb"\s*(\((?:[^\\)]|\\.)*\)|<[^>]*>)",
                       d, re.DOTALL)
        if mm is None:
            return None
        strings[key] = _pdf_string_bytes(mm.group(1))
    return EncryptionInfo(enc_num, v, rev, length // 8,
                          strings[b"O"], strings[b"U"], p, id0, aes)


class BadPassword(Exception):
    pass


def _to_literal(bs: bytes) -> bytes:
    """Re-emit decrypted bytes as an escaped LITERAL string — a hex
    re-emission would change how downstream consumers interpret it
    (PDF hex strings in outlines are conventionally UTF-16BE)."""
    out = bytearray(b"(")
    for b in bs:
        if b in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([b])
        elif 32 <= b < 127 or b in (0x0A, 0x0D, 0x09):
            out.append(b)
        else:
            out += ("\\%03o" % b).encode("ascii")
    out += b")"
    return bytes(out)


def decrypt_objects(objs: Dict[int, bytes], info: EncryptionInfo,
                    password: str = "",
                    gens: Optional[Dict[int, int]] = None
                    ) -> Dict[int, bytes]:
    """Return a fully-decrypted object map (streams and strings).
    ``gens`` maps object number → generation number (Algorithm 1
    derives the per-object key from BOTH; incrementally-updated
    real-world PDFs carry gen > 0)."""
    key = authenticate(password.encode("latin-1", "replace"),
                       info.o_entry, info.u_entry, info.p, info.id0,
                       info.rev, info.keylen)
    if key is None:
        raise BadPassword("pdf: wrong password")
    out: Dict[int, bytes] = {}
    for num, body in objs.items():
        if num == info.enc_num:
            out[num] = body
            continue
        ok = object_key(key, num,
                        gens.get(num, 0) if gens else 0, info.aes)
        si = body.find(b"stream")
        dict_part = body[:si] if si >= 0 else body
        # strings first (dict part only)
        pieces = []
        last = 0
        for a, b in _find_string_spans(dict_part):
            raw = _pdf_string_bytes(dict_part[a:b])
            if info.aes:
                dec = (aes128_cbc_decrypt(ok, raw[:16], raw[16:])
                       if len(raw) >= 32 else b"")
            else:
                dec = rc4(ok, raw)
            pieces.append(dict_part[last:a])
            # UTF-16BE payloads keep hex form (that is the convention
            # the string consumers assume); byte strings go literal
            if dec.startswith(b"\xfe\xff"):
                pieces.append(b"<" + dec.hex().encode("ascii") + b">")
            else:
                pieces.append(_to_literal(dec))
            last = b
        pieces.append(dict_part[last:])
        new_dict = b"".join(pieces)
        if si < 0:
            out[num] = new_dict
            continue
        data = _raw_stream_data(body, si)
        if data is None:
            out[num] = new_dict + body[si:]
            continue
        dec = (aes128_cbc_decrypt(ok, data[:16], data[16:])
               if info.aes else rc4(ok, data))
        new_dict = re.sub(rb"/Length\s+\d+",
                          b"/Length " + str(len(dec)).encode(),
                          new_dict, count=1)
        out[num] = (new_dict + b"stream\n" + dec + b"\nendstream")
    return out


def _raw_stream_data(body: bytes, si: int) -> Optional[bytes]:
    j = si + len(b"stream")
    if body[j:j + 2] == b"\r\n":
        j += 2
    elif body[j:j + 1] in (b"\n", b"\r"):
        j += 1
    k = body.rfind(b"endstream")
    if k < 0:
        return None
    data = body[j:k]
    if data.endswith(b"\r\n"):
        data = data[:-2]
    elif data.endswith(b"\n") or data.endswith(b"\r"):
        data = data[:-1]
    return data


# ------------------------------------------------------ encryption side

def encrypt_pdf(payload: bytes, user_pw: str = "", owner_pw: str = "",
                method: str = "rc4-128") -> bytes:
    """Encrypt a (fixture-builder) PDF with the standard handler.

    ``method``: ``rc4-40`` (V=1 R=2), ``rc4-128`` (V=2 R=3) or
    ``aesv2`` (V=4 R=4 AES-128-CBC). IVs are deterministic (md5 of the
    object number) so fixture corpora stay byte-reproducible."""
    v, rev, keylen, aes = {
        "rc4-40": (1, 2, 5, False),
        "rc4-128": (2, 3, 16, False),
        "aesv2": (4, 4, 16, True),
    }[method]
    upw = user_pw.encode("latin-1", "replace")
    opw = owner_pw.encode("latin-1", "replace") or upw
    p = -44                                   # print allowed, modify not
    id0 = hashlib.md5(b"fixture-id" + payload[:64]).digest()
    o_entry = compute_owner_entry(opw, upw, rev, keylen)
    key = compute_file_key(upw, o_entry, p, id0, rev, keylen)
    u_entry = compute_user_entry(key, rev, id0)

    obj_re = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
    out = bytearray()
    last = 0
    max_num = 0
    for m in obj_re.finditer(payload):
        num = int(m.group(1))
        gen = int(m.group(2))
        max_num = max(max_num, num)
        body = m.group(3)
        ok = object_key(key, num, gen, aes)

        def enc_bytes(raw: bytes) -> bytes:
            if aes:
                iv = hashlib.md5(b"iv%d" % num).digest()
                return iv + aes128_cbc_encrypt(ok, iv, raw)
            return rc4(ok, raw)

        si = body.find(b"stream")
        dict_part = body[:si] if si >= 0 else body
        pieces = []
        lo = 0
        for a, b in _find_string_spans(dict_part):
            raw = _pdf_string_bytes(dict_part[a:b])
            pieces.append(dict_part[lo:a])
            pieces.append(b"<" + enc_bytes(raw).hex().encode("ascii")
                          + b">")
            lo = b
        pieces.append(dict_part[lo:])
        new_dict = b"".join(pieces)
        if si >= 0:
            data = _raw_stream_data(body, si)
            enc = enc_bytes(data)
            new_dict = re.sub(rb"/Length\s+\d+",
                              b"/Length " + str(len(enc)).encode(),
                              new_dict, count=1)
            new_body = new_dict + b"stream\n" + enc + b"\nendstream"
        else:
            new_body = new_dict
        out += payload[last:m.start()]
        out += m.group(1) + b" " + m.group(2) + b" obj" + new_body \
            + b"endobj"
        last = m.end()
    out += payload[last:]

    enc_num = max_num + 1
    cf = (b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
          b"/StmF /StdCF /StrF /StdCF") if aes else b""
    enc_obj = (b"\n" + str(enc_num).encode() + b" 0 obj\n<< /Filter "
               b"/Standard /V " + str(v).encode() + b" /R "
               + str(rev).encode() + b" /Length "
               + str(keylen * 8).encode() + cf + b" /O <"
               + o_entry.hex().encode("ascii") + b"> /U <"
               + u_entry.hex().encode("ascii") + b"> /P "
               + str(p).encode() + b" >>\nendobj\n")
    # splice the encrypt object before the trailer and extend the
    # trailer dict with /Encrypt + /ID (fixture xref offsets go stale —
    # the regex-based reader never consults the xref table)
    ti = bytes(out).rfind(b"trailer")
    if ti < 0:
        ti = len(out)
    out2 = bytes(out[:ti]) + enc_obj + bytes(out[ti:])
    entry = (b" /Encrypt " + str(enc_num).encode() + b" 0 R /ID [<"
             + id0.hex().encode("ascii") + b"> <"
             + id0.hex().encode("ascii") + b">]")
    # splice right after the trailer's dict open — generation-agnostic
    # (a /Root N G R with any generation keeps working)
    out2, n = re.subn(rb"(trailer\s*<<)", rb"\1" + entry, out2, count=1)
    if n == 0:                               # no trailer dict: append one
        out2 += (b"trailer\n<<" + entry + b" >>\n")
    return out2
