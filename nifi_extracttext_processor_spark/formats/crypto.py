"""Pure-stdlib crypto primitives for PDF standard-security decryption
(formats/pdf_crypt.py): RC4 and AES-128/192/256 with CBC.

Written from the public specifications — AES from FIPS-197 (the
S-box generated from its GF(2^8) definition, not transcribed), RC4
from its well-known KSA/PRGA description. Test vectors: FIPS-197
Appendix C and the classic RC4 "Key"/"Plaintext" vector
(tests/test_formats.py::TestCryptoPrimitives).

This is a DECRYPTION convenience for data processing (reading
standard-encrypted PDFs with an empty user password, like Tika/PDFBox
do) — not a general-purpose crypto library; no constant-time claims.
"""

from __future__ import annotations


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % kl]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------------- AES

# S-box generated from the FIPS-197 definition: multiplicative
# inverse in GF(2^8) followed by the affine transformation.
def _build_sbox() -> tuple[bytes, bytes]:
    # GF(2^8) inverse via exp/log tables over generator 3
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for v in range(256):
        inv = 0 if v == 0 else exp[255 - log[v]]
        b = inv
        r = inv
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            r ^= b
        sbox[v] = r ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


class AES:
    """FIPS-197 block cipher, forward and inverse, 128/192/256-bit."""

    def __init__(self, key: bytes) -> None:
        if len(key) not in (16, 24, 32):
            raise ValueError("AES key must be 16/24/32 bytes")
        nk = len(key) // 4
        self.nr = nk + 6
        w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.nr + 1)):
            t = list(w[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            w.append([w[i - nk][j] ^ t[j] for j in range(4)])
        self.rk = [sum((w[4 * r + c] for c in range(4)), [])
                   for r in range(self.nr + 1)]

    @staticmethod
    def _add_rk(s: list[int], rk: list[int]) -> None:
        for i in range(16):
            s[i] ^= rk[i]

    def encrypt_block(self, block: bytes) -> bytes:
        # state laid out column-major: s[4*c + r] = state[r][c]
        s = list(block)
        self._add_rk(s, self.rk[0])
        for rnd in range(1, self.nr):
            s = [_SBOX[b] for b in s]
            # ShiftRows on column-major layout
            s = [s[(4 * ((i // 4) + (i % 4)) + i % 4) % 16]
                 for i in range(16)]
            ns = [0] * 16
            for c in range(4):
                a = s[4 * c:4 * c + 4]
                ns[4 * c + 0] = (_mul(a[0], 2) ^ _mul(a[1], 3)
                                 ^ a[2] ^ a[3])
                ns[4 * c + 1] = (a[0] ^ _mul(a[1], 2)
                                 ^ _mul(a[2], 3) ^ a[3])
                ns[4 * c + 2] = (a[0] ^ a[1] ^ _mul(a[2], 2)
                                 ^ _mul(a[3], 3))
                ns[4 * c + 3] = (_mul(a[0], 3) ^ a[1] ^ a[2]
                                 ^ _mul(a[3], 2))
            s = ns
            self._add_rk(s, self.rk[rnd])
        s = [_SBOX[b] for b in s]
        s = [s[(4 * ((i // 4) + (i % 4)) + i % 4) % 16]
             for i in range(16)]
        self._add_rk(s, self.rk[self.nr])
        return bytes(s)

    def decrypt_block(self, block: bytes) -> bytes:
        s = list(block)
        self._add_rk(s, self.rk[self.nr])
        for rnd in range(self.nr - 1, 0, -1):
            # InvShiftRows
            s = [s[(4 * ((i // 4) - (i % 4)) + i % 4) % 16]
                 for i in range(16)]
            s = [_INV_SBOX[b] for b in s]
            self._add_rk(s, self.rk[rnd])
            ns = [0] * 16
            for c in range(4):
                a = s[4 * c:4 * c + 4]
                ns[4 * c + 0] = (_mul(a[0], 14) ^ _mul(a[1], 11)
                                 ^ _mul(a[2], 13) ^ _mul(a[3], 9))
                ns[4 * c + 1] = (_mul(a[0], 9) ^ _mul(a[1], 14)
                                 ^ _mul(a[2], 11) ^ _mul(a[3], 13))
                ns[4 * c + 2] = (_mul(a[0], 13) ^ _mul(a[1], 9)
                                 ^ _mul(a[2], 14) ^ _mul(a[3], 11))
                ns[4 * c + 3] = (_mul(a[0], 11) ^ _mul(a[1], 13)
                                 ^ _mul(a[2], 9) ^ _mul(a[3], 14))
            s = ns
        s = [s[(4 * ((i // 4) - (i % 4)) + i % 4) % 16]
             for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        self._add_rk(s, self.rk[0])
        return bytes(s)


def _ecb_decrypt_many_numpy(aes: "AES", data: bytes):
    """Inverse cipher over ALL 16-byte blocks at once (numpy): each
    round is a handful of whole-array table lookups / XORs, ~1000x the
    scalar path on megabyte streams. Returns an (n, 16) uint8 array.
    CBC decryption parallelizes this way because each block's cipher
    input is independent (only the final XOR chains)."""
    import numpy as np

    inv_s = np.frombuffer(_INV_SBOX, dtype=np.uint8)
    m9 = np.array([_mul(v, 9) for v in range(256)], dtype=np.uint8)
    m11 = np.array([_mul(v, 11) for v in range(256)], dtype=np.uint8)
    m13 = np.array([_mul(v, 13) for v in range(256)], dtype=np.uint8)
    m14 = np.array([_mul(v, 14) for v in range(256)], dtype=np.uint8)
    inv_shift = np.array([(4 * ((i // 4) - (i % 4)) + i % 4) % 16
                          for i in range(16)])
    s = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16).copy()
    rk = [np.array(r, dtype=np.uint8) for r in aes.rk]
    s ^= rk[aes.nr]
    for rnd in range(aes.nr - 1, 0, -1):
        s = inv_s[s[:, inv_shift]]
        s ^= rk[rnd]
        ns = np.empty_like(s)
        for c in range(4):
            a0, a1, a2, a3 = (s[:, 4 * c], s[:, 4 * c + 1],
                              s[:, 4 * c + 2], s[:, 4 * c + 3])
            ns[:, 4 * c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
            ns[:, 4 * c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
            ns[:, 4 * c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
            ns[:, 4 * c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
        s = ns
    s = inv_s[s[:, inv_shift]]
    s ^= rk[0]
    return s


def aes_cbc_decrypt(key: bytes, data: bytes,
                    iv: bytes | None = None,
                    strip_padding: bool = True) -> bytes:
    """AES-CBC. iv=None means the IV is the first 16 bytes of `data`
    (the PDF stream convention). PKCS#7 padding stripped unless
    strip_padding=False (PDF key-wrapping uses no padding).

    Blocks are decrypted in PARALLEL via numpy (CBC's chain is only
    the post-XOR with the previous ciphertext block, a vector shift);
    pure-python scalar fallback when numpy is absent."""
    if iv is None:
        if len(data) < 16:
            raise ValueError("AES-CBC data shorter than its IV")
        iv, data = data[:16], data[16:]
    if len(data) % 16:
        raise ValueError("AES-CBC data not block-aligned")
    aes = AES(key)
    try:
        import numpy as np
    except ImportError:
        np = None
    if np is not None and data:
        dec = _ecb_decrypt_many_numpy(aes, data)
        prev = np.frombuffer(iv + data[:-16], dtype=np.uint8) \
            .reshape(-1, 16)
        out = bytearray((dec ^ prev).tobytes())
    else:
        out = bytearray()
        prev = iv
        for o in range(0, len(data), 16):
            blk = data[o:o + 16]
            d = aes.decrypt_block(blk)
            out += bytes(a ^ b for a, b in zip(d, prev))
            prev = blk
    if strip_padding and out:
        pad = out[-1]
        if 1 <= pad <= 16 and len(out) >= pad:
            out = out[:-pad]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                    add_padding: bool = True) -> bytes:
    """Forward CBC (fixture building + the R6 hardening loop)."""
    if add_padding:
        pad = 16 - len(data) % 16
        data = data + bytes([pad]) * pad
    elif len(data) % 16:
        raise ValueError("AES-CBC data not block-aligned")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for o in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[o:o + 16], prev))
        prev = aes.encrypt_block(blk)
        out += prev
    return bytes(out)


def aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-ECB (OOXML standard encryption uses it for the package)."""
    if len(data) % 16:
        raise ValueError("AES-ECB data not block-aligned")
    if not data:
        return b""
    aes = AES(key)
    try:
        import numpy as np
    except ImportError:
        np = None
    if np is not None:
        return _ecb_decrypt_many_numpy(aes, data).tobytes()
    return b"".join(aes.decrypt_block(data[o:o + 16])
                    for o in range(0, len(data), 16))


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    """Forward ECB (fixture building)."""
    if len(data) % 16:
        raise ValueError("AES-ECB data not block-aligned")
    aes = AES(key)
    return b"".join(aes.encrypt_block(data[o:o + 16])
                    for o in range(0, len(data), 16))
