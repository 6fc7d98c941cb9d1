"""Minimal OLE2 / Compound File Binary reader — pure stdlib.

Just enough of [MS-CFB] to open legacy Office containers: FAT chains,
mini-FAT, and the directory tree, so callers can read named streams
("WordDocument", "0Table"/"1Table", "Workbook").
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC


class Ole2File:
    def __init__(self, data: bytes):
        if data[:8] != MAGIC:
            raise ValueError("not an OLE2 compound file")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (self.num_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.num_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.num_difat,) = struct.unpack_from("<I", data, 72)
        self.fat = self._load_fat()
        self.dir_entries = self._load_dir()
        self.minifat = self._load_minifat()
        self.mini_stream = (
            self._read_chain(self.dir_entries[0]["start"],
                             self.dir_entries[0]["size"])
            if self.dir_entries else b"")

    def _sector(self, sid: int) -> bytes:
        off = 512 + sid * self.sector_size if self.sector_size == 512 else (
            (sid + 1) * self.sector_size)
        # header always occupies the first 512 bytes; for 4096-byte sectors
        # the first sector starts at 4096
        off = (sid + 1) * self.sector_size if self.sector_size != 512 else off
        return self.data[off : off + self.sector_size]

    def _load_fat(self) -> list[int]:
        difat: list[int] = list(
            struct.unpack_from("<109I", self.data, 76))
        sid = self.difat_start
        per = self.sector_size // 4 - 1
        while sid not in (ENDOFCHAIN, FREESECT) and sid < 0xFFFFFFFC:
            sec = self._sector(sid)
            vals = struct.unpack(f"<{self.sector_size // 4}I", sec)
            difat.extend(vals[:per])
            sid = vals[-1]
        fat: list[int] = []
        for fsid in difat:
            if fsid in (FREESECT, ENDOFCHAIN) or fsid >= 0xFFFFFFFC:
                continue
            fat.extend(struct.unpack(
                f"<{self.sector_size // 4}I", self._sector(fsid)))
        return fat

    def _read_chain(self, start: int, size: int | None = None) -> bytes:
        out = bytearray()
        sid = start
        seen = 0
        while sid not in (ENDOFCHAIN, FREESECT) and sid < 0xFFFFFFFC:
            out += self._sector(sid)
            seen += 1
            if seen > len(self.fat) + 2:
                break  # corrupt chain loop guard
            sid = self.fat[sid] if sid < len(self.fat) else ENDOFCHAIN
        return bytes(out[:size]) if size is not None else bytes(out)

    def _load_minifat(self) -> list[int]:
        if self.minifat_start >= 0xFFFFFFFC:
            return []
        raw = self._read_chain(self.minifat_start)
        return list(struct.unpack(f"<{len(raw) // 4}I", raw))

    def _load_dir(self) -> list[dict]:
        raw = self._read_chain(self.dir_start)
        entries = []
        for off in range(0, len(raw) - 127, 128):
            (name_len,) = struct.unpack_from("<H", raw, off + 64)
            if name_len == 0 or name_len > 64:
                entries.append({"name": "", "type": 0, "start": 0, "size": 0})
                continue
            name = raw[off : off + name_len - 2].decode("utf-16-le", "replace")
            etype = raw[off + 66]
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<Q", raw, off + 120)
            entries.append(
                {"name": name, "type": etype, "start": start, "size": size})
        return entries

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sid = start
        seen = 0
        while sid not in (ENDOFCHAIN, FREESECT) and sid < 0xFFFFFFFC:
            off = sid * self.mini_size
            out += self.mini_stream[off : off + self.mini_size]
            seen += 1
            if seen > len(self.minifat) + 2:
                break
            sid = self.minifat[sid] if sid < len(self.minifat) else ENDOFCHAIN
        return bytes(out[:size])

    def list_streams(self) -> list[str]:
        return [e["name"] for e in self.dir_entries if e["type"] == 2]

    def read_stream(self, name: str) -> bytes:
        for e in self.dir_entries:
            if e["type"] == 2 and e["name"] == name:
                if e["size"] < self.mini_cutoff:
                    return self._read_mini_chain(e["start"], e["size"])
                return self._read_chain(e["start"], e["size"])
        raise KeyError(name)
