"""OLE property sets ([MS-OLEPS]) — SummaryInformation metadata for
legacy Office files (.doc/.xls/.ppt), pure stdlib.

Tika's ExtractMediaMetadata surface (56409-tika.xml:1761 region) emits
these as attributes for legacy formats; this reads the
"\\x05SummaryInformation" stream and maps the well-known property ids
to Tika-style key names.
"""

from __future__ import annotations

import struct

from .ole2 import Ole2File

SUMMARY_STREAM = "\x05SummaryInformation"

# [MS-OLEPS] SummaryInformation property ids → Tika-style names
_PROP_NAMES = {
    2: "dc:title",
    3: "dc:subject",
    4: "dc:creator",
    5: "meta:keyword",
    8: "meta:last-author",
    12: "meta:creation-date",
    13: "dcterms:modified",
    18: "extended-properties:Application",
}

_VT_I2 = 2
_VT_I4 = 3
_VT_LPSTR = 30
_VT_LPWSTR = 31
_VT_FILETIME = 64

_EPOCH_DELTA = 11644473600  # seconds between 1601-01-01 and 1970-01-01


def _filetime_iso(lo: int, hi: int) -> str | None:
    ticks = (hi << 32) | lo
    if ticks == 0:
        return None
    secs = ticks // 10_000_000 - _EPOCH_DELTA
    try:
        import datetime as dt

        return dt.datetime.fromtimestamp(
            secs, dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    except (OverflowError, OSError, ValueError):
        return None


def _read_value(buf: bytes, off: int) -> str | None:
    (vtype,) = struct.unpack_from("<I", buf, off)
    off += 4
    if vtype == _VT_LPSTR:
        (n,) = struct.unpack_from("<I", buf, off)
        raw = buf[off + 4: off + 4 + n]
        return raw.split(b"\x00", 1)[0].decode("cp1252", "replace")
    if vtype == _VT_LPWSTR:
        (n,) = struct.unpack_from("<I", buf, off)
        raw = buf[off + 4: off + 4 + 2 * n]
        return raw.decode("utf-16-le", "replace").split("\x00", 1)[0]
    if vtype == _VT_FILETIME:
        lo, hi = struct.unpack_from("<II", buf, off)
        return _filetime_iso(lo, hi)
    if vtype == _VT_I4:
        return str(struct.unpack_from("<i", buf, off)[0])
    if vtype == _VT_I2:
        return str(struct.unpack_from("<h", buf, off)[0])
    return None


def summary_info(data: bytes) -> dict[str, str]:
    """Parse \\x05SummaryInformation from an OLE2 container (empty dict
    when the stream is absent or malformed — metadata is best-effort)."""
    out: dict[str, str] = {}
    try:
        stream = Ole2File(data).read_stream(SUMMARY_STREAM)
        # PropertySetStream header: byteOrder u16, version u16, sysid u32,
        # clsid 16B, count u32, then fmtid 16B + offset u32 per set
        (n_sets,) = struct.unpack_from("<I", stream, 24)
        if n_sets < 1:
            return out
        (set_off,) = struct.unpack_from("<I", stream, 44)
        (_size, n_props) = struct.unpack_from("<II", stream, set_off)
        for i in range(n_props):
            pid, poff = struct.unpack_from(
                "<II", stream, set_off + 8 + 8 * i)
            name = _PROP_NAMES.get(pid)
            if name is None:
                continue
            val = _read_value(stream, set_off + poff)
            if val:
                out[name] = val
    except Exception:
        return {}
    return out
