"""Legacy PowerPoint (.ppt) text extraction — pure stdlib.

Walks the [MS-PPT] binary record tree in the "PowerPoint Document" OLE2
stream and collects the two text atom kinds in document order:

  * TextCharsAtom  (recType 0x0FA0) — UTF-16LE text
  * TextBytesAtom  (0x0FA8) — 8-bit (cp1252) text

Every record is an 8-byte header (recVerAndInstance: u16, recType: u16,
recLen: u32, little-endian) followed by recLen payload bytes; a record
is a container (recurse) when its version nibble is 0xF.

Reference parity: the reference handles .ppt via Tika AutoDetectParser
(/root/reference/.../ExtractTextProcessor.java:158,173); this covers
the text Tika's PPT parser emits for simple decks.
"""

from __future__ import annotations

import struct

from .ole2 import Ole2File

RT_TEXT_CHARS = 0x0FA0
RT_TEXT_BYTES = 0x0FA8


def _walk_records(buf: bytes, out: list[str]) -> None:
    pos = 0
    end = len(buf)
    while pos + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", buf, pos)
        pos += 8
        if rlen > end - pos:
            break  # truncated record — stop cleanly
        payload = buf[pos:pos + rlen]
        pos += rlen
        if (ver_inst & 0x000F) == 0x000F:
            _walk_records(payload, out)
        elif rtype == RT_TEXT_CHARS:
            out.append(payload.decode("utf-16-le", "replace"))
        elif rtype == RT_TEXT_BYTES:
            out.append(payload.decode("cp1252", "replace"))


def extract_ppt_text(data: bytes) -> str:
    """One line per text atom (≈ one per placeholder/paragraph block)."""
    stream = Ole2File(data).read_stream("PowerPoint Document")
    texts: list[str] = []
    _walk_records(stream, texts)
    # PPT stores paragraph breaks as \r inside atoms — normalize
    lines = [t.replace("\r", "\n").rstrip("\x00") for t in texts]
    return "\n".join(lines).rstrip() + ("\n" if lines else "")
