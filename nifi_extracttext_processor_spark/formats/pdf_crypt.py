"""PDF standard security handler — decrypt-with-EMPTY-user-password,
the Tika/PDFBox transparent-decryption behavior (most "protected"
PDFs restrict editing, not reading).

Supported (ISO 32000-1 §7.6.3, 32000-2 §7.6.4):
  * R2 (40-bit RC4), R3 (RC4 up to 128-bit), R4 (V4 crypt filters
    /V2 RC4 or /AESV2), R6 (V5 /AESV3, AES-256 with the hardened
    Algorithm 2.B hash)
  * per-object keys for R<=4 (md5(file_key + obj3 + gen2 [+ sAlT]));
    the file key is used directly for V5
  * U-entry verification so a NON-empty-user-password document raises
    ValueError (routed to the failure port, like Tika's
    EncryptedDocumentException)

Not supported (raise ValueError): public-key security handlers
(/Adobe.PubSec), crypt filters other than Identity/V2/AESV2/AESV3.
"""

from __future__ import annotations

import hashlib
import re
import struct

from .crypto import aes_cbc_decrypt, aes_cbc_encrypt, rc4

# §7.6.3.3 Algorithm 2 padding string
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def _pdf_string(buf: bytes, key: bytes) -> bytes | None:
    """Value of /<key> ( literal or <hex> string in an already-located
    dict region. Handles \\-escapes incl. octal (enough for O/U/ID
    entries, which are binary strings)."""
    m = re.search(re.escape(key) + rb"\s*(\(|<(?!<))", buf)
    if not m:
        return None
    i = m.end() - 1
    if buf[i:i + 1] == b"<":
        j = buf.find(b">", i)
        if j < 0:
            return None
        h = re.sub(rb"\s+", b"", buf[i + 1:j])
        if len(h) % 2:
            h += b"0"
        try:
            return bytes.fromhex(h.decode("ascii"))
        except ValueError:
            return None
    out = bytearray()
    i += 1
    depth = 1
    while i < len(buf):
        c = buf[i]
        if c == 0x5C:  # backslash
            nxt = buf[i + 1:i + 2]
            if nxt.isdigit():
                o = buf[i + 1:i + 4]
                k = 1
                while k < 3 and buf[i + k:i + k + 1].isdigit():
                    k += 1
                out.append(int(buf[i + 1:i + 1 + k], 8) & 0xFF)
                i += 1 + k
                continue
            esc = {b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
                   b"(": 40, b")": 41, b"\\": 92}
            out.append(esc.get(nxt, nxt[0] if nxt else 92))
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out)
        out.append(c)
        i += 1
    return None


def _int_entry(buf: bytes, key: bytes, default: int) -> int:
    m = re.search(re.escape(key) + rb"\s+(-?\d+)", buf)
    return int(m.group(1)) if m else default


def _find_encrypt_dict(data: bytes) -> bytes | None:
    """The /Encrypt dictionary bytes (direct or via `N G obj`)."""
    m = None
    for m in re.finditer(rb"/Encrypt\s+(?:(\d+)\s+(\d+)\s+R|<<)", data):
        pass                       # last trailer wins (incremental)
    if m is None:
        return None
    if m.group(1) is None:         # inline dict
        start = m.end() - 2
    else:
        obj = re.search(rb"(?<![0-9])" + m.group(1)
                        + rb"\s+" + m.group(2) + rb"\s+obj", data)
        if not obj:
            return None
        start = data.find(b"<<", obj.end())
        if start < 0:
            return None
    # balance << >>
    depth = 0
    i = start
    while i < len(data) - 1:
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


def _file_id0(data: bytes) -> bytes:
    """First element of the trailer /ID array (empty if absent)."""
    matches = list(re.finditer(rb"/ID\s*\[\s*<([0-9a-fA-F\s]*)>", data))
    if not matches:
        return b""
    h = re.sub(rb"\s+", b"", matches[-1].group(1))
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _r6_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash."""
    K = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        K1 = (password + K + udata) * 64
        E = aes_cbc_encrypt(K[:16], K[16:32], K1, add_padding=False)
        mod = sum(E[:16]) % 3
        K = (hashlib.sha256 if mod == 0 else
             hashlib.sha384 if mod == 1 else hashlib.sha512)(E).digest()
        i += 1
        if i >= 64 and E[-1] <= i - 32:
            return K[:32]


class PdfDecryptor:
    """Callable (objnum, gen, ciphertext) -> plaintext for one
    document's strings/streams."""

    def __init__(self, file_key: bytes, aes: bool, v5: bool) -> None:
        self.file_key = file_key
        self.aes = aes
        self.v5 = v5

    def __call__(self, objnum: int, gen: int, data: bytes) -> bytes:
        if self.v5:
            key = self.file_key
        else:
            ext = struct.pack("<I", objnum)[:3] + struct.pack(
                "<H", gen)
            if self.aes:
                ext += b"sAlT"
            d = hashlib.md5(self.file_key + ext).digest()
            key = d[:min(len(self.file_key) + 5, 16)]
        if self.aes:
            return aes_cbc_decrypt(key, data)
        return rc4(key, data)


def decryptor_for(data: bytes) -> PdfDecryptor | None:
    """None for unencrypted documents; a PdfDecryptor when the
    standard handler with an EMPTY user password opens the document;
    ValueError otherwise (wrong password / unsupported handler)."""
    enc = _find_encrypt_dict(data)
    if enc is None:
        return None
    if not re.search(rb"/Filter\s*/Standard\b", enc):
        raise ValueError("unsupported PDF security handler")
    v = _int_entry(enc, b"/V", 0)
    r = _int_entry(enc, b"/R", 2)
    o = _pdf_string(enc, b"/O") or b""
    u = _pdf_string(enc, b"/U") or b""
    p = _int_entry(enc, b"/P", -1) & 0xFFFFFFFF

    if v == 5 or r == 6:
        ue = _pdf_string(enc, b"/UE") or b""
        if len(u) < 48 or len(ue) < 32:
            raise ValueError("malformed PDF /U//UE entries")
        vsalt, ksalt = u[32:40], u[40:48]
        if _r6_hash(b"", vsalt) != u[:32]:
            raise ValueError(
                "PDF requires a non-empty user password")
        ikey = _r6_hash(b"", ksalt)
        file_key = aes_cbc_decrypt(ikey, ue[:32], iv=bytes(16),
                                   strip_padding=False)
        return PdfDecryptor(file_key, aes=True, v5=True)

    if r not in (2, 3, 4):
        raise ValueError(f"unsupported PDF security revision {r}")
    length = _int_entry(enc, b"/Length", 40)
    n = 5 if r == 2 else max(5, min(16, length // 8))
    aes = False
    if v == 4:
        if re.search(rb"/AESV2\b", enc):
            aes = True
            n = 16
        elif not re.search(rb"/V2\b", enc) \
                and not re.search(rb"/Identity\b", enc):
            raise ValueError("unsupported PDF crypt filter")
    id0 = _file_id0(data)
    h = hashlib.md5()
    h.update(PAD)                      # empty user password -> pad only
    h.update(o[:32])
    h.update(struct.pack("<I", p))
    h.update(id0)
    if r >= 4 and re.search(rb"/EncryptMetadata\s+false", enc):
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    # Algorithm 6: verify the empty user password against /U
    if r == 2:
        expect = rc4(key, PAD)
        ok = expect == u[:32]
    else:
        h2 = hashlib.md5(PAD + id0).digest()
        enc_u = rc4(key, h2)
        for i in range(1, 20):
            enc_u = rc4(bytes(b ^ i for b in key), enc_u)
        ok = enc_u == u[:16]
    if not ok:
        raise ValueError("PDF requires a non-empty user password")
    return PdfDecryptor(key, aes=aes, v5=False)
