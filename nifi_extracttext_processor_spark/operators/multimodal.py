"""Multimodal column conventions (north star): image/audio/video as
opaque binary columns + typed metadata structs, with decode /
feature-extract / resize / frame-sample as Arrow-batched mapInPandas
stages.

The media codec libraries (Pillow, ffmpeg, torchaudio…) are NOT in this
container, so the decode kernels are STUBS — deterministic fakes behind
`fake=True` (default) and a clearly-marked NotImplementedError otherwise.
The Spark-side plumbing — schemas, batch iteration, partitioning, UDF
signatures — is real and tested; dropping in a real codec is a
one-function change that does not alter any plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, MapType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("content", BinaryType()),     # opaque encoded bytes
    StructField("mime_type", StringType()),
    StructField("meta", MapType(StringType(), StringType())),
])


def _passthrough_fields(df: DataFrame, drop: tuple[str, ...] = ()) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name not in drop)


def _fake_pixels(data: bytes, w: int, h: int) -> list[float]:
    """Deterministic stand-in for a real image decode: md5-seeded floats."""
    seed = hashlib.md5(data).digest()
    n = w * h
    out = []
    for i in range(n):
        b = seed[i % 16]
        out.append(round((b ^ (i & 0xFF)) / 255.0, 6))
    return out


# Hard ceiling on declared decode geometry (64 Mpx ≈ a 8192x8192
# frame). Python-list pixel output costs ~30 bytes/px, so header-
# declared dimensions must be budget-checked BEFORE any output buffer
# is allocated — otherwise a 68-byte file claiming 40000x40000 commits
# ~12 GB on an executor before the truncation check ever runs.
MAX_DECODE_PIXELS = 1 << 26


def _check_pixel_budget(w: int, h: int, fmt: str) -> None:
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{fmt} declared dimensions {w}x{h} exceed the "
            f"{MAX_DECODE_PIXELS}-pixel decode budget")


def _png_unfilter(raw: bytes, w: int, h: int, nch: int,
                  depth: int = 8) -> bytearray:
    """Undo PNG per-scanline filtering (types 0-4: None/Sub/Up/Average/
    Paeth, RFC 2083 §6) over `raw` = h scanlines of (1 filter byte +
    ceil(w*nch*depth/8) packed sample bytes). The filter's "left"
    distance is bpp = max(1, nch*depth//8) bytes (RFC 2083: sub-byte
    depths filter at 1-byte distance over the packed stream). Returns
    the flat unfiltered packed bytes."""
    stride = (w * nch * depth + 7) // 8
    bpp = max(1, (nch * depth) // 8)
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for row in range(h):
        f = raw[pos]
        pos += 1
        line = bytearray(raw[pos:pos + stride])
        pos += stride
        if f == 1:    # Sub: + left
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up: + above
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average: + floor((left + above) / 2)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                       else c)
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out[row * stride:(row + 1) * stride] = line
        prev = line
    return out


def _png_unpack_row(packed: bytes, w: int, nch: int,
                    depth: int) -> list[int]:
    """One packed scanline → w*nch sample values in their native range
    (0..2^depth-1 for sub-byte; 0..65535 for 16-bit)."""
    n = w * nch
    if depth == 8:
        return list(packed[:n])
    if depth == 16:
        return [(packed[2 * i] << 8) | packed[2 * i + 1]
                for i in range(n)]
    vals = []
    mask = (1 << depth) - 1
    per_byte = 8 // depth
    for i in range(n):
        byte = packed[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        vals.append((byte >> shift) & mask)
    return vals


def _decode_png_gray(data: bytes) -> tuple[int, int, list[float]]:
    """Pure-stdlib PNG decode: chunk walk → bounded zlib inflate →
    per-scanline unfilter → bit-unpack → ITU-R 601 luma (alpha
    ignored). Every legal (depth, color type) pair of RFC 2083 §4.1.1
    decodes: gray 1/2/4/8/16-bit, RGB 8/16-bit, palette 1/2/4/8-bit
    (PLTE lookup), gray+alpha and RGBA 8/16-bit, both progressive
    scan orders (none / Adam7 interlace). Corrupt structure (bad
    IDAT stream, illegal depth/type combo, missing/short PLTE,
    out-of-range palette index) raises ValueError."""
    import struct
    import zlib

    i = 8
    w = h = None
    depth = ctype = interlace = None
    idat: list[bytes] = []
    plte: bytes | None = None
    while i + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, i)
        cid = data[i + 4:i + 8]
        body = data[i + 8:i + 8 + clen]
        if cid == b"IHDR":
            if len(body) < 13:
                raise ValueError("truncated PNG IHDR")
            w, h = struct.unpack_from(">II", body, 0)
            depth, ctype, _, _, interlace = body[8:13]
        elif cid == b"PLTE":
            plte = bytes(body)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        i += 12 + clen  # len + type + body + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"invalid PNG color type {ctype}")
    legal_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    if depth not in legal_depths[ctype]:
        raise ValueError(
            f"invalid PNG depth {depth} for color type {ctype}")
    if ctype == 3 and (plte is None or len(plte) < 3 or len(plte) % 3):
        raise ValueError("paletted PNG missing or malformed PLTE")
    if w <= 0 or h <= 0:
        raise ValueError("bad PNG dimensions")
    _check_pixel_budget(w, h, "PNG")
    # Geometry: non-interlaced = ONE pass covering the image; Adam7 =
    # up to 7 sub-images (RFC 2083 §2.6 pixel grid), each filtered
    # independently and concatenated in the same zlib stream.
    if interlace == 0:
        passes = [(0, 0, 1, 1, w, h)]
    else:
        passes = []
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8),
                               (0, 4, 4, 8), (2, 0, 4, 4),
                               (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                passes.append((x0, y0, dx, dy, pw, ph))
    total = sum(ph * ((pw * nch * depth + 7) // 8 + 1)
                for *_, pw, ph in passes)
    # Bounded inflate: cap output at exactly the pixel-data size so a
    # crafted high-ratio IDAT (zlib reaches ~1000:1) cannot balloon
    # memory before _png_unfilter's own size check; trailing
    # decompressed bytes beyond the cap are ignored per the cap.
    try:
        raw = zlib.decompressobj().decompress(b"".join(idat), total)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from None
    # The inflated stream must cover every pass BEFORE the w*h output
    # list is allocated — the truncation check cannot live only in
    # _png_unfilter, which runs after the allocation.
    if len(raw) < total:
        raise ValueError("truncated PNG pixel data")
    maxv = (1 << depth) - 1
    px: list[float] = [0.0] * (w * h)
    pos = 0
    for x0, y0, dx, dy, pw, ph in passes:
        stride = (pw * nch * depth + 7) // 8
        seg = raw[pos:pos + ph * (stride + 1)]
        pos += ph * (stride + 1)
        packed = _png_unfilter(seg, pw, ph, nch, depth)
        for row in range(ph):
            vals = _png_unpack_row(
                packed[row * stride:(row + 1) * stride], pw, nch,
                depth)
            base = (y0 + row * dy) * w + x0
            if ctype == 3:
                for i in range(pw):
                    o = vals[i] * 3
                    if o + 3 > len(plte):
                        raise ValueError(
                            "PNG palette index out of range")
                    r, g, b = plte[o], plte[o + 1], plte[o + 2]
                    px[base + i * dx] = round(
                        (0.299 * r + 0.587 * g + 0.114 * b) / 255.0, 6)
            elif nch >= 3:
                for i in range(pw):
                    r, g, b = vals[i * nch], vals[i * nch + 1], \
                        vals[i * nch + 2]
                    px[base + i * dx] = round(
                        (0.299 * r + 0.587 * g + 0.114 * b) / maxv, 6)
            else:
                for i in range(pw):
                    px[base + i * dx] = round(vals[i * nch] / maxv, 6)
    return w, h, px


def _gif_lzw_decode(data: bytes, mcs: int, max_out: int) -> bytes:
    """GIF-variant LZW (GIF89a spec appendix F): LSB-first variable
    code width starting at mcs+1 bits, CLEAR/END control codes, table
    capped at 4096 entries (deferred-clear tolerated). Output is
    bounded at `max_out` indices — same memory posture as the PNG
    bounded inflate."""
    clear = 1 << mcs
    end = clear + 1
    code_size = mcs + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    prev: bytes | None = None
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + code_size <= nbits and len(out) < max_out:
        code = 0
        for k in range(code_size):
            code |= ((data[(bitpos + k) >> 3] >> ((bitpos + k) & 7))
                     & 1) << k
        bitpos += code_size
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            code_size = mcs + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("corrupt GIF LZW stream")
        elif code in table:
            entry = table[code]
        elif code == next_code:  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
    return bytes(out[:max_out])


def _gif_frames_raw(data: bytes):
    """Parse a GIF87a/89a container and yield, per image frame:
    (left, top, fw, fh, ct, idx, disposal, transparent) where `idx` is
    the deinterlaced fw*fh index stream in display row order and `ct`
    the effective (local-wins) color table. Also returns the logical
    screen via the generator's first yield being preceded by a
    (sw, sh, bg_idx, gct) header tuple tagged with None frame."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        raise ValueError("not a GIF")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_idx = data[11]
    i = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[i:i + 3 * n]
        i += 3 * n
    yield (sw, sh, bg_idx, gct)
    disposal = 0
    transparent: int | None = None
    found = False
    while i < len(data):
        b = data[i]
        if b == 0x21:  # extension: label byte then sub-blocks
            if (data[i + 1:i + 2] == b"\xf9"
                    and i + 4 <= len(data) and data[i + 2] >= 4
                    and i + 3 + data[i + 2] <= len(data)):
                flags = data[i + 3]  # graphic control (89a §23)
                disposal = (flags >> 2) & 0x07
                transparent = data[i + 6] if flags & 1 else None
            i += 2
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            if i + 10 > len(data):
                raise ValueError("truncated GIF image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", data,
                                                   i + 1)
            p = data[i + 9]
            interlaced = bool(p & 0x40)
            i += 10
            ct = gct
            if p & 0x80:  # local color table wins
                n = 2 << (p & 0x07)
                ct = data[i:i + 3 * n]
                i += 3 * n
            if not ct:
                raise ValueError("GIF image has no color table")
            if fw <= 0 or fh <= 0:
                raise ValueError("bad GIF dimensions")
            _check_pixel_budget(fw, fh, "GIF")
            if i >= len(data):
                raise ValueError("truncated GIF image data")
            mcs = data[i]
            i += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"bad GIF LZW min code size {mcs}")
            comp = bytearray()
            while i < len(data) and data[i] != 0:
                n = data[i]
                comp += data[i + 1:i + 1 + n]
                i += 1 + n
            i += 1  # block terminator
            raw = _gif_lzw_decode(bytes(comp), mcs, fw * fh)
            if len(raw) < fw * fh:
                raise ValueError("truncated GIF pixel data")
            if interlaced:  # the 4 interlace passes -> row order
                order = ([*range(0, fh, 8)] + [*range(4, fh, 8)]
                         + [*range(2, fh, 4)] + [*range(1, fh, 2)])
                idx = bytearray(fw * fh)
                for src_row, y in enumerate(order):
                    idx[y * fw:(y + 1) * fw] = raw[src_row * fw:
                                                   (src_row + 1) * fw]
                idx = bytes(idx)
            else:
                idx = raw
            found = True
            yield (left, top, fw, fh, ct, idx, disposal, transparent)
            disposal = 0
            transparent = None
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block type 0x{b:02x}")
    if not found:
        raise ValueError("GIF contains no image data")


def _ct_luma255(ct: bytes, c: int) -> int:
    if 3 * c + 3 > len(ct):
        raise ValueError("GIF color index out of range")
    return int(round(0.299 * ct[3 * c] + 0.587 * ct[3 * c + 1]
                     + 0.114 * ct[3 * c + 2]))


def _decode_gif_gray(data: bytes) -> tuple[int, int, list[float]]:
    """Pure-stdlib GIF decode (GIF87a/89a): global/local color table,
    LZW index stream, optional 4-pass row interlace — of the FIRST
    image frame, at the frame's own dimensions (transparency ignored:
    feature extraction wants the drawn colors). For animation-aware
    full-canvas frames see decode_gif_frames."""
    it = _gif_frames_raw(data)
    next(it)  # logical-screen header
    for (_, _, fw, fh, ct, idx, _, _) in it:
        n_colors = len(ct) // 3
        px: list[float] = [0.0] * (fw * fh)
        for k in range(fw * fh):
            c = idx[k]
            if c >= n_colors:
                raise ValueError("GIF color index out of range")
            r, g, bl = ct[3 * c], ct[3 * c + 1], ct[3 * c + 2]
            px[k] = round(
                (0.299 * r + 0.587 * g + 0.114 * bl) / 255.0, 6)
        return fw, fh, px
    raise ValueError("GIF contains no image data")


def decode_gif_frames(data: bytes,
                      max_frames: int | None = None,
                      ) -> tuple[int, int, list[bytes]]:
    """Animated-GIF keyframe decode: composite each image frame onto
    the logical-screen canvas honoring the Graphic Control Extension —
    transparent-index pixels leave the canvas unchanged, disposal 2
    restores the frame rect to background after the frame shows,
    disposal 3 restores the pre-frame canvas (snapshot), 0/1 leave the
    canvas. Returns (screen_w, screen_h, [one luma-bytes canvas per
    frame, 0-255 row-major]), at most `max_frames` frames."""
    it = _gif_frames_raw(data)
    sw, sh, bg_idx, gct = next(it)
    if sw <= 0 or sh <= 0:
        raise ValueError("bad GIF dimensions")
    _check_pixel_budget(sw, sh, "GIF")
    bg = 0
    if gct is not None and 3 * bg_idx + 3 <= len(gct):
        bg = _ct_luma255(gct, bg_idx)
    canvas = bytearray([bg]) * (sw * sh)
    frames: list[bytes] = []
    for (left, top, fw, fh, ct, idx, disposal, transparent) in it:
        n_colors = len(ct) // 3
        snapshot = bytes(canvas) if disposal == 3 else None
        for y in range(fh):
            cy = top + y
            if cy >= sh:
                break
            row = cy * sw
            src = y * fw
            for x in range(min(fw, sw - left)):
                c = idx[src + x]
                if c == transparent:
                    continue
                if c >= n_colors:
                    raise ValueError("GIF color index out of range")
                canvas[row + left + x] = _ct_luma255(ct, c)
        frames.append(bytes(canvas))
        if max_frames is not None and len(frames) >= max_frames:
            break
        if disposal == 2:    # restore rect to background
            for y in range(fh):
                cy = top + y
                if cy >= sh:
                    break
                row = cy * sw
                for x in range(min(fw, sw - left)):
                    canvas[row + left + x] = bg
        elif disposal == 3 and snapshot is not None:
            canvas[:] = snapshot
    return sw, sh, frames


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing,
    CLEAR=256/EOI=257, table grows from 258, and the "early change"
    quirk — code width bumps when the NEXT code would be 2^width - 1,
    one code earlier than GIF. Output bounded at `max_out` bytes, same
    memory posture as the GIF LZW and PNG bounded inflate."""
    CLEAR, EOI = 256, 257
    code_size = 9
    base = {i: bytes([i]) for i in range(256)}
    table = dict(base)
    next_code = 258
    prev: bytes | None = None
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + code_size <= nbits and len(out) < max_out:
        code = 0
        for k in range(code_size):
            p = bitpos + k
            code = (code << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
        bitpos += code_size
        if code == CLEAR:
            table = dict(base)
            code_size = 9
            next_code = 258
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("corrupt TIFF LZW stream")
        elif code in table:
            entry = table[code]
        elif code == next_code:  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW stream")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) - 1 and code_size < 12:
                code_size += 1  # early change
        out += entry
        prev = entry
    return bytes(out[:max_out])


def _decode_tiff_gray(data: bytes) -> tuple[int, int, list[float]]:
    """Baseline TIFF decode, pure stdlib: uncompressed (1), LZW (5,
    incl. the early-change width quirk and horizontal-differencing
    Predictor=2), Deflate (8/32946, bounded per-strip inflate) and
    PackBits (32773) chunky strips, 8-bit grayscale
    (PhotometricInterpretation 0/1, WhiteIsZero inverted) or RGB(A)
    (extra samples ignored), IFD0 only. JPEG-in-TIFF/deflate, planar,
    palette and non-8-bit depths raise NotImplementedError; structural
    damage ValueError."""
    import struct

    if data[:4] not in (b"II*\x00", b"MM\x00*") or len(data) < 8:
        raise ValueError("not a TIFF")
    e = ">" if data[:2] == b"MM" else "<"
    (ifd_off,) = struct.unpack_from(f"{e}I", data, 4)
    if ifd_off < 8 or ifd_off + 2 > len(data):
        raise ValueError("bad TIFF IFD offset")
    (n_tags,) = struct.unpack_from(f"{e}H", data, ifd_off)
    sizes = {1: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for t in range(min(n_tags, 256)):
        off = ifd_off + 2 + t * 12
        if off + 12 > len(data):
            raise ValueError("truncated TIFF IFD")
        tag, typ = struct.unpack_from(f"{e}HH", data, off)
        (cnt,) = struct.unpack_from(f"{e}I", data, off + 4)
        if typ not in sizes or cnt > 65536:
            continue
        total = sizes[typ] * cnt
        if total <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(f"{e}I", data, off + 8)
        vals = []
        for k in range(cnt):
            o = voff + k * sizes[typ]
            if o + sizes[typ] > len(data):
                raise ValueError("truncated TIFF tag values")
            if typ == 1:
                vals.append(data[o])
            elif typ == 3:
                vals.append(struct.unpack_from(f"{e}H", data, o)[0])
            else:
                vals.append(struct.unpack_from(f"{e}I", data, o)[0])
        tags[tag] = vals
    comp = tags.get(259, [1])[0]
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported (uncompressed, "
            "LZW, Deflate and PackBits only)")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} unsupported")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF unsupported")
    if 256 not in tags or 257 not in tags or 273 not in tags:
        raise ValueError("TIFF missing required tags")
    w, h = tags[256][0], tags[257][0]
    if w <= 0 or h <= 0:
        raise ValueError("bad TIFF dimensions")
    _check_pixel_budget(w, h, "TIFF")
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1] * spp)
    photo = tags.get(262, [1])[0]
    if any(b != 8 for b in bps):
        raise NotImplementedError("non-8-bit TIFF unsupported")
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} unsupported (gray/RGB only)")
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    strips = tags[273]
    counts = tags.get(279, [len(data) - strips[0]])
    need = w * h * spp
    buf = bytearray()
    for so, sc in zip(strips, counts):
        if so + sc > len(data):
            raise ValueError("truncated TIFF strip data")
        if comp == 5:      # LZW: each strip is its own stream
            buf += _tiff_lzw_decode(data[so:so + sc],
                                    need - len(buf))
        elif comp in (8, 32946):  # Deflate (Adobe 8 / legacy 32946):
            import zlib     # per-strip zlib stream, bounded inflate
            try:
                buf += zlib.decompressobj().decompress(
                    data[so:so + sc], need - len(buf))
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt TIFF deflate strip: {exc}") from None
        elif comp == 32773:  # PackBits (TIFF 6.0 §9): per-strip byte RLE
            i = so
            end = so + sc
            while i < end and len(buf) < need:
                n = data[i]
                i += 1
                if n < 128:      # literal run of n+1 bytes
                    if i + n + 1 > end:
                        raise ValueError("truncated TIFF PackBits")
                    buf += data[i:i + n + 1]
                    i += n + 1
                elif n > 128:    # repeat next byte 257-n times
                    if i >= end:
                        raise ValueError("truncated TIFF PackBits")
                    buf += bytes([data[i]]) * (257 - n)
                    i += 1
                # n == 128: no-op per spec
        else:
            buf += data[so:so + sc]
    if len(buf) < need:
        raise ValueError("truncated TIFF pixel data")
    if predictor == 2:  # horizontal differencing: undo per row/channel
        row_bytes = w * spp
        for r0 in range(0, need, row_bytes):
            for x in range(spp, row_bytes):
                buf[r0 + x] = (buf[r0 + x] + buf[r0 + x - spp]) & 0xFF
    px: list[float] = []
    for p in range(0, need, spp):
        if photo == 2:
            r, g, b = buf[p], buf[p + 1], buf[p + 2]
            lum = 0.299 * r + 0.587 * g + 0.114 * b
        else:
            v = buf[p]
            if photo == 0:  # WhiteIsZero
                v = 255 - v
            lum = float(v)
        px.append(round(lum / 255.0, 6))
    return w, h, px


def decode_raster_gray(data: bytes) -> tuple[int, int, list[float]]:
    """Pure-stdlib REAL decode of PNG (every legal depth/color-type
    combo — gray 1-16 bit, RGB, palette, alpha — plain or Adam7
    interlaced),
    JPEG (huffman 8-bit, baseline AND progressive/SOF2, gray/YCbCr,
    any sampling, restart markers — the Y plane IS the 601 luma),
    GIF (LZW, first frame, plain or interlaced), BMP (24/32-bit
    truecolor, 1/4/8-bit paletted, RLE8-compressed), and binary
    PPM (P6) / PGM (P5) incl. 16-bit into
    (width, height, row-major grayscale floats in [0, 1], ITU-R 601
    luma, round-6).

    Formats needing codec libraries (video/...) and JPEG variants
    beyond huffman 8-bit (arithmetic-coded, 12-bit, lossless) raise
    NotImplementedError — honestly; see decode_image. Baseline AND
    progressive (SOF2) huffman JPEGs decode for real.
    """
    import struct

    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png_gray(data)

    if data[:3] == b"\xff\xd8\xff":
        from ..formats.jpeg_decode import decode_jpeg_gray
        return decode_jpeg_gray(data, max_pixels=MAX_DECODE_PIXELS)

    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif_gray(data)

    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff_gray(data)

    if data[:2] == b"BM":
        if len(data) < 54:
            raise ValueError("truncated BMP header")
        px_off = struct.unpack_from("<I", data, 10)[0]
        hdr_size = struct.unpack_from("<I", data, 14)[0]
        width = struct.unpack_from("<i", data, 18)[0]
        height = struct.unpack_from("<i", data, 22)[0]
        bpp = struct.unpack_from("<H", data, 28)[0]
        compression = struct.unpack_from("<I", data, 30)[0]
        clr_used = struct.unpack_from("<I", data, 46)[0]
        if compression not in (0, 1):
            raise NotImplementedError(
                f"compressed BMP (method {compression}) unsupported "
                "(uncompressed and RLE8 only)")
        if bpp not in (1, 4, 8, 24, 32):
            raise NotImplementedError(f"{bpp}-bit BMP unsupported")
        if compression == 1 and bpp != 8:
            raise ValueError("RLE8 compression requires 8-bit BMP")
        if width <= 0 or height == 0:
            raise ValueError("bad BMP dimensions")
        top_down = height < 0
        height = abs(height)
        _check_pixel_budget(width, height, "BMP")

        def _luma255(r: int, g: int, b: int) -> float:
            return round((0.299 * r + 0.587 * g + 0.114 * b) / 255.0, 6)

        palette: list[float] | None = None
        if bpp <= 8:
            n_colors = clr_used or (1 << bpp)
            pal_off = 14 + hdr_size
            if pal_off + 4 * n_colors > len(data):
                raise ValueError("truncated BMP color table")
            palette = [
                _luma255(data[pal_off + 4 * c + 2],
                         data[pal_off + 4 * c + 1],
                         data[pal_off + 4 * c])
                for c in range(n_colors)]

        if compression == 1:  # RLE8: runs + escapes, bottom-up rows
            if px_off >= len(data):
                raise ValueError("truncated BMP pixel data")
            grid = [[0.0] * width for _ in range(height)]
            x, y, i = 0, 0, px_off
            eof = False
            while i + 1 < len(data):
                n, v = data[i], data[i + 1]
                i += 2
                if n > 0:  # encoded run
                    if v >= len(palette):
                        raise ValueError("BMP color index out of range")
                    for _ in range(n):
                        if x < width and y < height:
                            grid[y][x] = palette[v]
                        x += 1
                elif v == 0:    # end of line
                    x, y = 0, y + 1
                elif v == 1:    # end of bitmap
                    eof = True
                    break
                elif v == 2:    # delta
                    if i + 1 >= len(data):
                        raise ValueError("truncated BMP RLE delta")
                    x += data[i]
                    y += data[i + 1]
                    i += 2
                else:           # absolute mode: v literal indices
                    if i + v > len(data):
                        raise ValueError("truncated BMP RLE literals")
                    for k in range(v):
                        c = data[i + k]
                        if c >= len(palette):
                            raise ValueError(
                                "BMP color index out of range")
                        if x < width and y < height:
                            grid[y][x] = palette[c]
                        x += 1
                    i += v + (v & 1)  # literals pad to word boundary
            if not eof:
                # fail CLOSED like the uncompressed path — a stream
                # that never reaches the end-of-bitmap escape would
                # otherwise fabricate a black image from corrupt input
                raise ValueError("truncated BMP pixel data")
            rows = grid if top_down else grid[::-1]
            return width, height, [v for row in rows for v in row]

        stride = ((bpp * width + 31) // 32) * 4
        px: list[float] = []
        for row in range(height):
            src_row = row if top_down else height - 1 - row
            base = px_off + src_row * stride
            if base + (bpp * width + 7) // 8 > len(data):
                raise ValueError("truncated BMP pixel data")
            if bpp >= 24:
                nbytes = bpp // 8
                for x in range(width):
                    o = base + x * nbytes
                    px.append(_luma255(data[o + 2], data[o + 1],
                                       data[o]))
            else:
                per_byte = 8 // bpp
                mask = (1 << bpp) - 1
                for x in range(width):
                    byte = data[base + x // per_byte]
                    shift = 8 - bpp * (x % per_byte + 1)
                    c = (byte >> shift) & mask
                    if c >= len(palette):
                        raise ValueError("BMP color index out of range")
                    px.append(palette[c])
        return width, height, px

    if data[:2] in (b"P5", b"P6"):
        # netpbm header: magic, width, height, maxval — '#' comments
        # allowed between tokens; a single whitespace ends the header
        toks: list[int] = []
        i = 2
        while len(toks) < 3:
            while i < len(data) and data[i:i + 1].isspace():
                i += 1
            if data[i:i + 1] == b"#":
                while i < len(data) and data[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(data) and not data[j:j + 1].isspace():
                j += 1
            toks.append(int(data[i:j]))
            i = j
        i += 1  # the single whitespace after maxval
        width, height, maxval = toks
        if not (0 < maxval < 65536):
            raise ValueError(f"bad netpbm maxval {maxval}")
        if width <= 0 or height <= 0:
            raise ValueError("bad netpbm dimensions")
        _check_pixel_budget(width, height, "netpbm")
        nch = 3 if data[:2] == b"P6" else 1
        wide = maxval > 255  # 2-byte big-endian samples per the spec
        need = width * height * nch * (2 if wide else 1)
        body = data[i:i + need]
        if len(body) < need:
            raise ValueError("truncated netpbm pixel data")
        if wide:
            samples = [(body[o] << 8) | body[o + 1]
                       for o in range(0, need, 2)]
        else:
            samples = body
        px = []
        for p in range(0, width * height * nch, nch):
            if nch == 3:
                r, g, b = samples[p], samples[p + 1], samples[p + 2]
                lum = 0.299 * r + 0.587 * g + 0.114 * b
            else:
                lum = float(samples[p])
            px.append(round(lum / maxval, 6))
        return width, height, px

    raise NotImplementedError(
        "real decode supports PNG, JPEG (baseline+progressive), GIF, TIFF, BMP and "
        "binary PPM/PGM only; other formats need codec libraries this "
        "container does not ship")


def decode_image(
    df: DataFrame,
    content_col: str = "content",
    width: int = 8,
    height: int = 8,
    fake: bool = True,
) -> DataFrame:
    """content → pixels array<float> (grayscale) + width/height.

    fake=True (default): deterministic md5-seeded pixels at the given
    (width, height) — the oracle-checkable stand-in for codec formats
    the container cannot decode.

    fake=False: REAL decode via decode_raster_gray (pure-stdlib PNG /
    baseline+progressive JPEG / GIF / TIFF / BMP / binary PPM / PGM);
    width/height parameters are ignored and each row carries its
    image's true dimensions. Formats that need codec libraries raise
    NotImplementedError, honestly.
    """
    schema = (_passthrough_fields(df)
              + ", pixels ARRAY<FLOAT>, width INT, height INT")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if fake:
                pdf["pixels"] = [
                    _fake_pixels(bytes(b) if b is not None else b"",
                                 width, height)
                    for b in pdf[content_col]]
                pdf["width"] = width
                pdf["height"] = height
            else:
                decoded = [decode_raster_gray(bytes(b or b""))
                           for b in pdf[content_col]]
                pdf["pixels"] = [d[2] for d in decoded]
                pdf["width"] = [d[0] for d in decoded]
                pdf["height"] = [d[1] for d in decoded]
            yield pdf

    return df.mapInPandas(_run, schema=schema)


def image_features(
    df: DataFrame,
    pixels_col: str = "pixels",
    n_features: int = 16,
) -> DataFrame:
    """pixels → fixed-size feature vector (mean-pooled blocks) —
    numpy-vectorized, the real shape of an embedding-extraction stage."""
    schema = _passthrough_fields(df) + ", features ARRAY<FLOAT>"

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for px in pdf[pixels_col]:
                # float64 + explicit left-to-right block sums so the
                # arithmetic is exactly reproducible in SQL (the DuckDB
                # oracle computes (p1+p2+...)/w in the same order)
                arr = np.asarray(px, dtype=np.float64)
                if arr.size == 0:
                    feats.append([0.0] * n_features)
                    continue
                pad = (-arr.size) % n_features
                if pad:
                    arr = np.pad(arr, (0, pad))
                blocks = arr.reshape(n_features, -1)
                acc = blocks[:, 0].copy()
                for c in range(1, blocks.shape[1]):
                    acc = acc + blocks[:, c]
                means = acc / blocks.shape[1]
                feats.append([round(float(x), 6) for x in means])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(_run, schema=schema)


def resize_image(
    df: DataFrame,
    pixels_col: str = "pixels",
    src_w: int = 8, src_h: int = 8,
    dst_w: int = 4, dst_h: int = 4,
) -> DataFrame:
    """Nearest-neighbor resize on the decoded pixel array (numpy).

    Source dimensions: when the frame carries ``width``/``height``
    columns (both decode_image paths emit them), each row resizes from
    its OWN dimensions — this is what makes the operator compose with
    real decode of variable-size images. Without those columns the
    fixed ``src_w``/``src_h`` apply to every row. A row whose pixel
    count does not match its dimensions raises ValueError."""
    schema = (_passthrough_fields(df, drop=("width", "height", pixels_col))
              + f", {pixels_col} ARRAY<FLOAT>, width INT, height INT")
    has_dims = "width" in df.columns and "height" in df.columns

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for j, px in enumerate(pdf[pixels_col]):
                sw = int(pdf["width"].iloc[j]) if has_dims else src_w
                sh = int(pdf["height"].iloc[j]) if has_dims else src_h
                if len(px) != sw * sh:
                    raise ValueError(
                        f"pixel count {len(px)} != {sw}x{sh}")
                arr = np.asarray(px, dtype=np.float32).reshape(sh, sw)
                ys = np.arange(dst_h) * sh // dst_h
                xs = np.arange(dst_w) * sw // dst_w
                out.append([float(v) for v in arr[np.ix_(ys, xs)].ravel()])
            res = pdf.drop(columns=[pixels_col, "width", "height"],
                           errors="ignore").copy()
            res[pixels_col] = out
            res["width"] = dst_w
            res["height"] = dst_h
            yield res

    return df.mapInPandas(_run, schema=schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    every_n: int = 10,
    max_frames: int = 3,
    fake: bool = True,
) -> DataFrame:
    """video/animation content → exploded (frame_no, frame binary)
    rows.

    fake=True (default): deterministic md5-derived frame payloads so
    downstream plumbing (explode cardinality, binary transport) is
    fully exercised — the oracle-checkable stand-in.

    fake=False: REAL sampling for animated GIF content — every
    `every_n`-th composed full-canvas frame (disposal/transparency
    honored, see decode_gif_frames), at most `max_frames`, each
    emitted as a self-describing binary PGM (P5) so downstream
    decode_image(fake=False) can decode the sampled frames — AND for
    MJPEG AVI (RIFF movi walk; frames are JPEG payloads, decodable by
    decode_image(fake=False) incl. the DHT-less MJPEG quirk via the
    Annex K default tables in formats/jpeg_decode.py). Other video
    containers raise NotImplementedError — the container ships no
    ffmpeg/pyav.
    """
    schema = (_passthrough_fields(df)
              + ", frame_no INT, frame BINARY")

    def _run_real(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for j in range(len(pdf)):
                data = bytes(pdf[content_col].iloc[j] or b"")
                if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                    from ..formats.av_meta import avi_mjpeg_frames
                    need = (max_frames - 1) * every_n + 1
                    frames = avi_mjpeg_frames(data, max_frames=need)
                    if not frames:
                        raise NotImplementedError(
                            "AVI stream is not MJPEG; other codecs "
                            "need ffmpeg/pyav")
                    for fi in range(0, len(frames), every_n):
                        rec = pdf.iloc[j].to_dict()
                        rec["frame_no"] = fi
                        rec["frame"] = frames[fi]
                        rows.append(rec)
                    continue
                if data[:6] not in (b"GIF87a", b"GIF89a"):
                    raise NotImplementedError(
                        "real frame sampling supports animated GIF "
                        "and MJPEG AVI only; other video needs "
                        "ffmpeg/pyav, which this container does not "
                        "ship")
                need = (max_frames - 1) * every_n + 1
                w, h, frames = decode_gif_frames(data, max_frames=need)
                hdr = b"P5\n%d %d\n255\n" % (w, h)
                for fi in range(0, len(frames), every_n):
                    rec = pdf.iloc[j].to_dict()
                    rec["frame_no"] = fi
                    rec["frame"] = hdr + frames[fi]
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=list(pdf.columns) + ["frame_no",
                                                   "frame"])

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            # vectorized explode: repeat every input row max_frames times
            # (no per-row dict building — index-repeat + tiled frame_no)
            rep = pdf.loc[pdf.index.repeat(max_frames)].reset_index(drop=True)
            frame_nos = np.tile(np.arange(max_frames) * every_n, n)
            rep["frame_no"] = frame_nos.astype("int32")
            rep["frame"] = [
                hashlib.md5((bytes(c) if c is not None else b"")
                            + f"#{fn}".encode()).digest()
                for c, fn in zip(rep[content_col], frame_nos)]
            yield rep

    return df.mapInPandas(_run if fake else _run_real, schema=schema)


def fake_image_feat_sum_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    width: int = 8,
    height: int = 8,
    n_features: int = 16,
) -> str:
    """DuckDB twin of decode_image(fake) → image_features → feat_sum
    over media faked from `text_expr` (content = UTF-8 bytes of text).

    Reproduces the exact arithmetic: md5-seeded bytes, xor with pixel
    index, /255 round-6, FLOAT storage truncation between the two
    mapInPandas stages, fold-left block means, round-6 FLOAT features,
    fold-left double sum round-4."""
    n_px = width * height
    assert n_px % n_features == 0
    block = n_px // n_features
    # pixel i: round((seed_byte[i % 16] XOR i) / 255, 6) stored as FLOAT
    px = (f"list_transform(range({n_px}), i -> "
          f"CAST(round(xor(('0x' || substr(hx, 2 * (i % 16) + 1, 2))::BIGINT,"
          f" i) / 255.0, 6) AS FLOAT))")
    mean = "(" + " + ".join(
        f"pixels[{block} * j + {c + 1}]" + ("::DOUBLE" if c == 0 else "")
        for c in range(block)) + f") / {block}.0"
    feats = (f"list_transform(range({n_features}), j -> "
             f"CAST(round({mean}, 6) AS FLOAT))")
    return f"""
WITH h_t AS (
  SELECT {id_col} AS media_id, md5(coalesce({text_expr}, '')) AS hx
  FROM {table}
), px_t AS (
  SELECT media_id, {px} AS pixels FROM h_t
), feat_t AS (
  SELECT media_id, {feats} AS features FROM px_t
)
SELECT media_id,
       round(list_sum(list_transform(features, f -> f::DOUBLE)), 4)
         AS feat_sum
FROM feat_t
"""


def fake_frame_sample_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    every_n: int = 10,
    max_frames: int = 3,
) -> str:
    """DuckDB twin of sample_frames(fake) → md5-of-hex(frame): the fake
    frame is md5(content || '#' || frame_no) raw digest; DuckDB's md5
    is VARCHAR-only, so both sides hash the UPPERCASE-hex digest."""
    frame_nos = ", ".join(
        str(f * every_n) for f in range(max_frames))
    return f"""
SELECT {id_col} AS media_id,
       CAST(fn.frame_no AS BIGINT) AS frame_no,
       md5(upper(md5(coalesce({text_expr}, '') || '#' || fn.frame_no)))
         AS frame_md5
FROM {table}, (SELECT unnest([{frame_nos}]) AS frame_no) fn
"""


def fake_audio_mfcc_sum_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    n_mfcc: int = 8,
) -> str:
    """DuckDB twin of audio_features(fake) → mfcc_sum: coefficient i is
    byte 0 of md5(content || '#i') / 255 round-6 (FLOAT storage),
    summed fold-left in double, round-4."""
    coeff = (f"CAST(round((('0x' || substr(md5(coalesce({text_expr}, '') "
             f"|| '#' || i), 1, 2))::BIGINT) / 255.0, 6) AS FLOAT)::DOUBLE")
    return f"""
SELECT {id_col} AS media_id,
       round(list_sum(list_transform(range({n_mfcc}), i -> {coeff})), 4)
         AS mfcc_sum
FROM {table}
"""


# IMA ADPCM step table (IMA "Recommended Practices for Enhancing
# Digital Audio Compatibility", 1992 — the standard 89-entry table
# every IMA/DVI decoder shares, incl. CPython's audioop, which the
# tests use as an independent reference) and index-adjust table.
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ulaw_byte(u: int) -> int:
    """G.711 µ-law byte → linear 16-bit sample (closed-form spec
    expansion: bias 0x84, 3-bit exponent, 4-bit mantissa)."""
    u = ~u & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return -mag if u & 0x80 else mag


def _alaw_byte(a: int) -> int:
    """G.711 A-law byte → linear 16-bit sample (closed-form spec
    expansion: XOR 0x55, exponent-0 special case)."""
    a ^= 0x55
    exp = (a >> 4) & 7
    mant = a & 0x0F
    if exp == 0:
        mag = (mant << 4) + 8
    else:
        mag = ((mant << 4) + 0x108) << (exp - 1)
    return mag if a & 0x80 else -mag    # sign bit 1 = positive


def _ima_decode_nibble(nib: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM step: nibble + (predictor, step index) → new
    (predictor, index). The standard vpdiff expansion with int16
    clamping — identical arithmetic to audioop.adpcm2lin."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[nib & 7]))
    return pred, index


def _ima_adpcm_blocks(raw: bytes, nch: int,
                      block_align: int) -> list[float]:
    """WAV IMA ADPCM (format 0x11) block walk → interleaved float
    samples in [-1, 1]. Per block and channel: a 4-byte header
    (int16 predictor, uint8 step index, reserved) emitting the first
    sample, then the data region in 4-byte words round-robin per
    channel, LOW nibble first within each byte."""
    import struct

    if block_align < 4 * nch:
        raise ValueError("IMA ADPCM block smaller than its headers")
    out: list[list[float]] = [[] for _ in range(nch)]
    for bo in range(0, len(raw) - (4 * nch) + 1, block_align):
        block = raw[bo:bo + block_align]
        preds, idxs = [], []
        for c in range(nch):
            pred, idx = struct.unpack_from("<hB", block, c * 4)[:2]
            idx = min(88, idx)
            preds.append(pred)
            idxs.append(idx)
            out[c].append(pred / 32768.0)
        data = block[4 * nch:]
        # 4-byte words alternate channels: ch0 word, ch1 word, ...
        for wo in range(0, len(data) - 3, 4 * nch):
            for c in range(nch):
                word = data[wo + c * 4:wo + c * 4 + 4]
                for b in word:
                    for nib in (b & 0x0F, b >> 4):
                        preds[c], idxs[c] = _ima_decode_nibble(
                            nib, preds[c], idxs[c])
                        out[c].append(preds[c] / 32768.0)
    n = min(len(ch) for ch in out)
    inter: list[float] = []
    for f in range(n):
        for c in range(nch):
            inter.append(out[c][f])
    return inter


def decode_audio_pcm(data: bytes) -> tuple[int, int, list[float]]:
    """Pure-stdlib RIFF/WAVE decode → (sample_rate, n_channels,
    mono waveform floats in [-1, 1], channel-averaged).

    Supports PCM (format 1) at 8 (unsigned) / 16 / 24 / 32-bit signed,
    IEEE float (format 3) at 32/64-bit, G.711 A-law (format 6) and
    µ-law (format 7) via their closed-form spec expansions, and IMA
    ADPCM (format 0x11) via the standard 89-entry step table — the
    telephony and speech-corpus encodings, all verifiable in-container
    against stdlib audioop. Chunk walk honors word alignment and
    skips non-fmt/data chunks (LIST, cue, ...).

    Perceptual/transform codecs (MPEG Layer I-III, AAC, Vorbis...)
    raise NotImplementedError — an environment determination, not a
    gap: see README "MPEG audio decode" (their conformance depends on
    large spec-tabulated data — the 512-coefficient synthesis window,
    Layer III Huffman tables — that cannot be validated here without
    a reference decoder or conformance bitstreams, and an unvalidated
    decoder would produce plausible-but-WRONG waveforms that silently
    corrupt fingerprints; the honest-failure A6 posture routes them
    to the error side instead)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = raw = None
    i = 12
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        (sz,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        i += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if fmt is None or len(fmt) < 16 or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if nch < 1 or rate < 1:
        raise ValueError("bad WAV fmt chunk")
    if audio_fmt == 1 and bits in (8, 16, 24, 32):
        if bits == 8:
            vals = [(b - 128) / 128.0 for b in raw]
        elif bits == 16:
            vals = [v / 32768.0 for (v,) in
                    struct.iter_unpack("<h", raw[:len(raw) & ~1])]
        elif bits == 24:
            vals = []
            for o in range(0, len(raw) - 2, 3):
                v = raw[o] | (raw[o + 1] << 8) | (raw[o + 2] << 16)
                if v >= 1 << 23:
                    v -= 1 << 24
                vals.append(v / float(1 << 23))
        else:
            vals = [v / 2147483648.0 for (v,) in
                    struct.iter_unpack("<i", raw[:len(raw) & ~3])]
    elif audio_fmt == 3 and bits in (32, 64):
        code, width = ("<f", 4) if bits == 32 else ("<d", 8)
        vals = [float(v) for (v,) in
                struct.iter_unpack(code, raw[:len(raw)
                                             - len(raw) % width])]
    elif audio_fmt == 7 and bits == 8:      # G.711 µ-law
        vals = [_ulaw_byte(b) / 32768.0 for b in raw]
    elif audio_fmt == 6 and bits == 8:      # G.711 A-law
        vals = [_alaw_byte(b) / 32768.0 for b in raw]
    elif audio_fmt == 0x11 and bits == 4:   # IMA ADPCM
        block_align = struct.unpack_from("<H", fmt, 12)[0]
        vals = _ima_adpcm_blocks(raw, nch, block_align)
    else:
        raise NotImplementedError(
            f"WAV format {audio_fmt} at {bits}-bit needs a codec "
            "library (PCM 8/16/24/32, float 32/64, G.711 u/A-law, "
            "IMA ADPCM supported)")
    n_frames = len(vals) // nch
    mono = [sum(vals[f * nch:(f + 1) * nch]) / nch
            for f in range(n_frames)]
    return rate, nch, mono


def audio_waveform_stats(
    df: DataFrame,
    content_col: str = "content",
) -> DataFrame:
    """REAL audio feature extraction over PCM WAV content columns:
    (sample_rate, n_channels, n_samples, duration_s, rms, peak,
    zero_crossing_rate) per row, via decode_audio_pcm in an
    Arrow-batched mapInPandas kernel. The codec-free real counterpart
    to the fake-MFCC ``audio_features`` path (same plumbing shape:
    binary in, typed columns out, passthrough preserved)."""
    schema = (_passthrough_fields(df)
              + ", sample_rate INT, n_channels INT, n_samples LONG"
              + ", duration_s FLOAT, rms FLOAT, peak FLOAT"
              + ", zero_crossing_rate FLOAT")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            cols: dict[str, list] = {k: [] for k in
                                     ("sample_rate", "n_channels",
                                      "n_samples", "duration_s", "rms",
                                      "peak", "zero_crossing_rate")}
            for b in pdf[content_col]:
                rate, nch, mono = decode_audio_pcm(bytes(b or b""))
                n = len(mono)
                rms = (sum(v * v for v in mono) / n) ** 0.5 if n else 0.0
                peak = max((abs(v) for v in mono), default=0.0)
                zc = sum(1 for i in range(1, n)
                         if (mono[i - 1] < 0) != (mono[i] < 0))
                cols["sample_rate"].append(rate)
                cols["n_channels"].append(nch)
                cols["n_samples"].append(n)
                cols["duration_s"].append(round(n / rate, 6))
                cols["rms"].append(round(rms, 6))
                cols["peak"].append(round(peak, 6))
                cols["zero_crossing_rate"].append(
                    round(zc / n, 6) if n else 0.0)
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    return df.mapInPandas(_run, schema=schema)


def mfcc_features(mono: list[float], rate: int, n_mfcc: int = 8,
                  frame_len: float = 0.025, hop: float = 0.010,
                  n_mels: int = 26, n_fft: int = 512) -> list[float]:
    """REAL MFCC from a mono waveform, numpy-only (textbook pipeline:
    25 ms hamming frames at 10 ms hop → |rfft|² power spectrum →
    triangular mel filterbank (Stevens-Volkmann 2595·log10(1+f/700))
    → log → orthonormal DCT-II), averaged over frames into one
    n_mfcc-coefficient descriptor per clip."""
    import numpy as np

    x = np.asarray(mono, dtype=np.float64)
    fl = max(1, int(rate * frame_len))
    hp = max(1, int(rate * hop))
    # n_fft must cover the frame (rfft would TRUNCATE longer frames —
    # at 44.1 kHz a 25 ms frame is 1102 samples, above the 512
    # default): grow to the next power of two >= fl
    while n_fft < fl:
        n_fft <<= 1
    if len(x) < fl:
        x = np.pad(x, (0, fl - len(x)))
    n_frames = 1 + (len(x) - fl) // hp
    idx = (np.arange(fl)[None, :]
           + hp * np.arange(n_frames)[:, None])
    frames = x[idx] * np.hamming(fl)
    power = np.abs(np.fft.rfft(frames, n_fft)) ** 2 / n_fft
    # mel filterbank over 0..rate/2
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    mel_pts = np.linspace(0.0, hz_to_mel(rate / 2.0), n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    bins = np.floor((n_fft + 1) * hz_pts / rate).astype(int)
    bins = np.clip(bins, 0, n_fft // 2)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        if c > lo:
            fb[m - 1, lo:c] = (np.arange(lo, c) - lo) / (c - lo)
        if hi > c:
            fb[m - 1, c:hi] = (hi - np.arange(c, hi)) / (hi - c)
    loge = np.log(power @ fb.T + 1e-10)       # (frames, mels)
    # orthonormal DCT-II over the mel axis
    n = np.arange(n_mels)
    basis = np.cos(np.pi * (n[None, :] + 0.5)
                   * np.arange(n_mfcc)[:, None] / n_mels)
    basis *= np.sqrt(2.0 / n_mels)
    basis[0] /= np.sqrt(2.0)
    mfcc = loge @ basis.T                      # (frames, n_mfcc)
    return [round(float(v), 6) for v in mfcc.mean(axis=0)]


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    n_mfcc: int = 8,
    fake: bool = True,
) -> DataFrame:
    """audio content → MFCC vector.

    fake=True (default): deterministic md5-derived stand-in — the
    oracle-checkable path.
    fake=False: REAL MFCCs for PCM WAV content (decode_audio_pcm +
    mfcc_features, numpy-only — no torchaudio/librosa needed);
    compressed audio raises NotImplementedError (no codec libs)."""
    schema = _passthrough_fields(df) + ", mfcc ARRAY<FLOAT>"

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf = pdf.copy()
                vecs = []
                for b in pdf[content_col]:
                    rate, _nch, mono = decode_audio_pcm(
                        bytes(b or b""))
                    vecs.append(mfcc_features(mono, rate,
                                              n_mfcc=n_mfcc))
                pdf["mfcc"] = vecs
                yield pdf
                continue
            pdf = pdf.copy()
            # coefficient index appended as ASCII ("#0".."#7") so the
            # digest input never contains NUL bytes and the DuckDB
            # oracle can reproduce it with VARCHAR md5()
            pdf["mfcc"] = [
                [round(hashlib.md5(
                    bytes(b or b"") + f"#{i}".encode()).digest()[0]
                       / 255.0, 6) for i in range(n_mfcc)]
                for b in pdf[content_col]]
            yield pdf

    return df.mapInPandas(_run, schema=schema)
