"""Audio/video CONTAINER metadata — pure stdlib, header walks only.

Extends the B3 ExtractMediaMetadata surface (reference template
56409-tika.xml:1761 region; Tika parser property names) to the three
container families Tika handles that we previously did not:

  * MP4 / ISO base media (ISO/IEC 14496-12 box walk: ftyp, mvhd,
    tkhd, hdlr, stsd) — Tika's MP4Parser surface
  * FLAC (STREAMINFO + VORBIS_COMMENT metadata blocks)
  * Ogg (Vorbis / Opus identification + comment headers, duration
    from the last page's granule position)

No codec payload is decoded — these are bounded header/structure
walks, best-effort (return {} / partial on malformation; the caller
treats metadata as never-fail, operators/extract.py:180).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------- MP4

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl",
                   b"edts", b"udta", b"iprp", b"ipco", b"ilst"}
# FullBox containers: 4 bytes of version/flags precede the children
_MP4_FULL_CONTAINERS = {b"meta"}

_BRAND_MIME = {
    b"M4A ": "audio/mp4",
    b"M4B ": "audio/mp4",
    b"qt  ": "video/quicktime",
    b"M4V ": "video/x-m4v",
    b"3gp4": "video/3gpp", b"3gp5": "video/3gpp", b"3gp6": "video/3gpp",
    b"3g2a": "video/3gpp2",
    b"avif": "image/avif", b"avis": "image/avif",
    b"heic": "image/heic", b"heix": "image/heic",
    b"mif1": "image/heif", b"msf1": "image/heif-sequence",
}

# iTunes-style ilst atoms -> Tika keys (value lives in a child `data`
# box: 8-byte header + 4-byte type + 4-byte locale + payload)
_ILST_KEYS = {b"\xa9nam": "dc:title", b"\xa9ART": "xmpDM:artist",
              b"\xa9alb": "xmpDM:album", b"\xa9gen": "xmpDM:genre",
              b"\xa9day": "xmpDM:releaseDate"}


def mp4_mime(data: bytes) -> str | None:
    """MIME from the ftyp major brand (None if not ISO-BMFF)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    return _BRAND_MIME.get(data[8:12], "video/mp4")


def _walk_boxes(data: bytes, start: int, end: int, depth: int = 0):
    """Yield (fourcc, body_start, body_end) for the sibling boxes in
    data[start:end]. Malformed sizes terminate the walk (fail-closed,
    partial results kept). Depth is bounded by the caller's recursion."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", data, i)
        typ = data[i + 4:i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, i + 8)
            body = i + 16
        elif size == 0:          # box extends to end of file
            size = end - i
        if size < body - i or i + size > end:
            return               # malformed: stop, keep what we have
        yield typ, body, i + size
        i += size


def mp4_metadata(data: bytes) -> dict[str, str]:
    """ISO-BMFF metadata under Tika MP4Parser property names:
    xmpDM:duration (mvhd), tiff:ImageWidth/Length (video tkhd),
    xmpDM:videoCompressor / audioCompressor (stsd fourcc),
    xmpDM:audioSampleRate + channels (mp4a sample entry)."""
    if mp4_mime(data) is None:
        return {}
    out: dict[str, str] = {}
    out["xmpDM:majorBrand"] = data[8:12].decode("ascii", "replace").strip()

    def walk(start: int, end: int, depth: int, handler: str | None) -> str | None:
        if depth > 8:
            return handler
        for typ, b, e in _walk_boxes(data, start, end):
            if typ == b"mvhd" and e - b >= 20:
                ver = data[b]
                ts = dur = 0
                if ver == 1:
                    # v1: 4 ver/flags + 8+8 times, then ts u32 + dur
                    # u64 at b+20 -> full read needs 32 bytes
                    if e - b >= 32:
                        ts, dur = struct.unpack_from(">IQ", data, b + 20)
                elif ver == 0:
                    ts, dur = struct.unpack_from(">II", data, b + 12)
                if ts:
                    out["xmpDM:duration"] = str(round(dur / ts, 3))
            elif typ == b"tkhd" and e - b >= 84:
                # width/height: after ver/flags(4) + times/id/dur
                # (20 v0 / 32 v1) + reserved+layer+volume(16) +
                # matrix(36) -> body+76 (v0) / body+88 (v1)
                ver = data[b]
                off = (b + 88) if ver == 1 else (b + 76)
                if off + 8 <= e:
                    w, h = struct.unpack_from(">II", data, off)
                    w, h = w >> 16, h >> 16     # 16.16 fixed point
                    if w and h:
                        out.setdefault("tiff:ImageWidth", str(w))
                        out.setdefault("tiff:ImageLength", str(h))
            elif typ == b"hdlr" and e - b >= 12:
                handler = data[b + 8:b + 12].decode("ascii", "replace")
            elif typ == b"stsd" and e - b >= 16:
                # entry: size u32 + fourcc; audio entries carry
                # channelcount u16 @+24, samplerate 16.16 @+32
                fourcc = data[b + 12:b + 16].decode("ascii", "replace")
                if handler == "soun":
                    out.setdefault("xmpDM:audioCompressor", fourcc)
                    # stsd body: ver/flags(4) + count(4) + entry
                    # header(8) + AudioSampleEntry body through the
                    # 16.16 samplerate field (28) = 44 bytes
                    if e - b >= 44:
                        nch, = struct.unpack_from(">H", data, b + 32)
                        sr, = struct.unpack_from(">I", data, b + 40)
                        if sr >> 16:
                            out.setdefault("xmpDM:audioSampleRate",
                                           str(sr >> 16))
                        if nch:
                            out.setdefault("channels", str(nch))
                elif handler == "vide":
                    out.setdefault("xmpDM:videoCompressor", fourcc)
            elif typ == b"ispe" and e - b >= 12:
                # HEIF/AVIF image spatial extents (FullBox)
                iw, ih = struct.unpack_from(">II", data, b + 4)
                if iw and ih:
                    out.setdefault("tiff:ImageWidth", str(iw))
                    out.setdefault("tiff:ImageLength", str(ih))
            elif typ in _ILST_KEYS and e - b >= 16:
                # first child `data` box holds the tag value; slice to
                # ITS declared end, not the parent atom's (multi-value
                # tags carry sibling boxes after it)
                if data[b + 4:b + 8] == b"data":
                    (dsz,) = struct.unpack_from(">I", data, b)
                    dend = min(b + dsz, e) if dsz >= 16 else e
                    val = data[b + 16:dend].decode("utf-8", "replace")
                    if val:
                        out.setdefault(_ILST_KEYS[typ], val)
            elif typ in _MP4_CONTAINERS:
                handler = walk(b, e, depth + 1, handler)
                if typ == b"trak":
                    handler = None   # handler type is per-track
            elif typ in _MP4_FULL_CONTAINERS and e - b >= 4:
                handler = walk(b + 4, e, depth + 1, handler)
        return handler

    walk(0, len(data), 0, None)
    return out


# -------------------------------------------------------------- FLAC

_VC_KEYS = {"title": "dc:title", "artist": "xmpDM:artist",
            "album": "xmpDM:album", "genre": "xmpDM:genre",
            "date": "xmpDM:releaseDate"}


def _vorbis_comments(body: bytes) -> dict[str, str]:
    """Parse a Vorbis comment block (little-endian length-prefixed
    vendor + key=value list) into Tika property names."""
    out: dict[str, str] = {}
    if len(body) < 8:
        return out
    (vlen,) = struct.unpack_from("<I", body, 0)
    i = 4 + vlen
    if i + 4 > len(body):
        return out
    (count,) = struct.unpack_from("<I", body, i)
    i += 4
    for _ in range(min(count, 1024)):
        if i + 4 > len(body):
            break
        (clen,) = struct.unpack_from("<I", body, i)
        i += 4
        if clen > len(body) - i:
            break
        try:
            kv = body[i:i + clen].decode("utf-8")
        except UnicodeDecodeError:
            i += clen
            continue
        i += clen
        k, _, v = kv.partition("=")
        key = _VC_KEYS.get(k.lower())
        if key and v:
            out.setdefault(key, v)
    return out


def _skip_id3v2(data: bytes) -> int:
    """Byte offset past a leading ID3v2 tag (0 when none)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    return 10 + ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                 | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))


def flac_metadata(data: bytes) -> dict[str, str]:
    """FLAC STREAMINFO (rate/channels/bits/duration) + VORBIS_COMMENT
    tags under the same property names as WAV/MP3 metadata. A leading
    ID3v2 tag (older taggers wrap FLAC in one) is skipped."""
    off = _skip_id3v2(data)
    if off:
        data = data[off:]
    if data[:4] != b"fLaC":
        return {}
    out: dict[str, str] = {}
    i = 4
    while i + 4 <= len(data):
        hdr = data[i]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(data[i + 1:i + 4], "big")
        body = data[i + 4:i + 4 + blen]
        if len(body) < blen:
            break               # truncated: keep what we have
        if btype == 0 and blen >= 34:   # STREAMINFO
            # bits 80..99 samplerate, 100..102 channels-1,
            # 103..107 bps-1, 108..143 total samples (RFC 9639 §8.2)
            bits = int.from_bytes(body[10:18], "big")
            rate = bits >> 44
            nch = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            if rate:
                out["xmpDM:audioSampleRate"] = str(rate)
                out["channels"] = str(nch)
                out["bits"] = str(bps)
                out["xmpDM:audioCompressor"] = "FLAC"
                if total:
                    out["xmpDM:duration"] = str(round(total / rate, 3))
        elif btype == 4:                # VORBIS_COMMENT
            out.update(_vorbis_comments(body))
        i += 4 + blen
        if last:
            break
    return out


# --------------------------------------------------------------- Ogg


def _ogg_packets(data: bytes, max_pages: int = 16) -> list[bytes]:
    """Reassemble the first few logical packets from an Ogg stream's
    initial pages (enough for id + comment headers)."""
    packets: list[bytes] = []
    cur = b""
    i = 0
    for _ in range(max_pages):
        if data[i:i + 4] != b"OggS" or i + 27 > len(data):
            break
        nseg = data[i + 26]
        seg_tab = data[i + 27:i + 27 + nseg]
        if len(seg_tab) < nseg:
            break
        j = i + 27 + nseg
        for s in seg_tab:
            cur += data[j:j + s]
            j += s
            if s < 255:
                packets.append(cur)
                cur = b""
        i = j
        if len(packets) >= 3:
            break
    return packets


def ogg_mime(data: bytes) -> str | None:
    """MIME for an Ogg container by its first packet's codec magic."""
    if data[:4] != b"OggS":
        return None
    pk = _ogg_packets(data, max_pages=1)
    head = pk[0][:16] if pk else b""
    if head.startswith(b"\x01vorbis"):
        return "audio/vorbis"
    if head.startswith(b"OpusHead"):
        return "audio/opus"
    if head.startswith(b"\x80theora"):
        return "video/theora"
    if head.startswith(b"\x7fFLAC"):
        return "audio/x-oggflac"
    return "application/ogg"


def ogg_metadata(data: bytes) -> dict[str, str]:
    """Ogg Vorbis/Opus identification + comment headers; duration from
    the final page's granule position (samples at the id header's
    rate — 48 kHz fixed for Opus per RFC 7845 §4)."""
    if data[:4] != b"OggS":
        return {}
    out: dict[str, str] = {}
    packets = _ogg_packets(data)
    rate = 0
    preskip = 0
    if packets and packets[0].startswith(b"\x01vorbis"):
        p = packets[0]
        if len(p) >= 16:
            nch = p[11]
            (rate,) = struct.unpack_from("<I", p, 12)
            out["xmpDM:audioCompressor"] = "Vorbis"
            out["xmpDM:audioSampleRate"] = str(rate)
            out["channels"] = str(nch)
        if len(packets) > 1 and packets[1].startswith(b"\x03vorbis"):
            out.update(_vorbis_comments(packets[1][7:]))
    elif packets and packets[0].startswith(b"OpusHead"):
        p = packets[0]
        if len(p) >= 12:
            nch = p[9]
            out["xmpDM:audioCompressor"] = "Opus"
            out["channels"] = str(nch)
            out["xmpDM:audioSampleRate"] = "48000"
            rate = 48000  # granule positions are 48 kHz (RFC 7845)
            # granule includes the decoder pre-skip (RFC 7845 §4.2)
            (preskip,) = struct.unpack_from("<H", p, 10)
        if len(packets) > 1 and packets[1].startswith(b"OpusTags"):
            out.update(_vorbis_comments(packets[1][8:]))
    if rate:
        # last page's granule = total PCM samples (abs position)
        tail = data[-65536:]
        k = tail.rfind(b"OggS")
        if k >= 0 and k + 14 <= len(tail):
            (granule,) = struct.unpack_from("<q", tail, k + 6)
            granule -= preskip
            if granule > 0:
                out["xmpDM:duration"] = str(round(granule / rate, 3))
    return out


# --------------------------------------------------------------- AVI


def avi_metadata(data: bytes) -> dict[str, str]:
    """AVI (RIFF) main header: duration/frame-rate/dims from avih,
    video codec fourcc from the first video strh. Best-effort, header
    walk only — MJPEG frame extraction lives in
    operators/multimodal.sample_frames(fake=False)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return {}
    out: dict[str, str] = {}

    def walk(start: int, end: int, depth: int) -> None:
        i = start
        while i + 8 <= end and depth < 6:
            cid = data[i:i + 4]
            (sz,) = struct.unpack_from("<I", data, i + 4)
            body_start = i + 8
            if sz > end - body_start:
                return
            if cid == b"LIST":
                walk(body_start + 4, body_start + sz, depth + 1)
            elif cid == b"avih" and sz >= 40:
                (us_per_frame, _, _, _, total_frames) = \
                    struct.unpack_from("<IIIII", data, body_start)
                w, h = struct.unpack_from("<II", data, body_start + 32)
                if w and h:
                    out.setdefault("tiff:ImageWidth", str(w))
                    out.setdefault("tiff:ImageLength", str(h))
                if us_per_frame:
                    out.setdefault(
                        "xmpDM:videoFrameRate",
                        str(round(1e6 / us_per_frame, 3)))
                    if total_frames:
                        out.setdefault(
                            "xmpDM:duration",
                            str(round(total_frames * us_per_frame
                                      / 1e6, 3)))
            elif cid == b"strh" and sz >= 8:
                typ = data[body_start:body_start + 4]
                fcc = data[body_start + 4:body_start + 8]
                if typ == b"vids":
                    out.setdefault(
                        "xmpDM:videoCompressor",
                        fcc.decode("ascii", "replace").strip("\x00 "))
            i = body_start + sz + (sz & 1)

    walk(12, len(data), 0)
    return out


def _ensure_dht(frame: bytes) -> bytes:
    """MJPEG/OpenDML quirk: AVI-embedded JPEG frames routinely omit
    their DHT segments (decoders shall assume the T.81 Annex K typical
    tables). Resolve it HERE, at the container layer, by splicing the
    Annex K DHT before SOS when the frame defines no tables — the
    standalone JPEG decoder stays strict."""
    i = 2
    n = len(frame)
    sos_at = None
    while i + 4 <= n:
        if frame[i] != 0xFF:
            break
        while i + 1 < n and frame[i + 1] == 0xFF:
            i += 1
        marker = frame[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xC4:
            return frame            # has its own tables
        if marker == 0xDA:
            sos_at = i
            break
        if i + 4 > n:
            break
        seg_len = struct.unpack_from(">H", frame, i + 2)[0]
        if seg_len < 2:
            break
        i += 2 + seg_len
    if sos_at is None:
        return frame                # malformed: pass through as-is
    from .jpeg_decode import annexk_dht_segment
    return frame[:sos_at] + annexk_dht_segment() + frame[sos_at:]


def avi_mjpeg_frames(data: bytes, max_frames: int = 1 << 10
                     ) -> list[bytes]:
    """JPEG frame payloads from an AVI's movi list (##dc/##db chunks
    that start with the JPEG SOI marker), in stream order, with the
    Annex K DHT spliced into DHT-less frames (see _ensure_dht).
    Bounded by max_frames; non-MJPEG chunks are skipped."""
    frames: list[bytes] = []
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return frames

    def walk(start: int, end: int, depth: int) -> None:
        i = start
        while i + 8 <= end and depth < 6 and len(frames) < max_frames:
            cid = data[i:i + 4]
            (sz,) = struct.unpack_from("<I", data, i + 4)
            body = i + 8
            if sz > end - body:
                return
            if cid == b"LIST":
                walk(body + 4, body + sz, depth + 1)
            elif (len(cid) == 4 and cid[2:4] in (b"dc", b"db")
                    and data[body:body + 2] == b"\xff\xd8"):
                frames.append(_ensure_dht(data[body:body + sz]))
            i = body + sz + (sz & 1)

    walk(12, len(data), 0)
    return frames
