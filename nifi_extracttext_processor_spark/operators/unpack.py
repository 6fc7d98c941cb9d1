"""Archive unpacking: explode zip/tar/gzip containers into per-member
document rows — the NiFi UnpackContent stage the extraction pipeline
was missing (mail archives, dataset dumps, and crawl bundles arrive
as containers; reference MIME detection already names
application/zip / x-tar / gzip, formats/mime.py, but nothing exploded
them).

Composes with the existing flow: read_documents -> unpack_archives ->
extract_text. Non-archive rows pass through unchanged (member_name
NULL), so the operator is safe to leave permanently in a pipeline.

Scale + safety posture:
- map-only Arrow kernel (one task per archive; archives are the
  parallel unit, like WARC's gzip segments) — no shuffle.
- fail-closed bounds, same as the WARC/PNG decoders: per-member
  declared-size cap BEFORE any read (zip-bomb: a member claiming
  4 GB is skipped, not inflated), member-count cap, a PER-ARCHIVE
  total decompressed-bytes cap (10,000 individually-legal 64 MB
  members must not inflate to 640 GB in one task), and gzip streamed
  through the shared bounded multi-member walk
  (formats._decompress_capped — concatenated .gz streams decode
  fully, not just the first member).
- per-archive atomic emission: a container that raises mid-iteration
  emits ONE row with `unpack_error` set and empty content (the A6
  empty-content-on-failure posture) — already-decoded members of the
  broken container are DROPPED, so downstream never sees a partial
  member set masquerading as a complete one. A total-cap stop is the
  deliberate exception: decoded members are kept and a final marker
  row records that the remainder was skipped.
- bounded task memory: rows are flushed to Arrow in chunks whose
  decoded payload stays ~max_total_bytes, never a whole input batch
  of decoded archives at once.
- one level of unpacking per call (apply twice for nested archives —
  unbounded recursion inside a kernel is how bombs win).
"""

from __future__ import annotations

import io
import tarfile
import zipfile
import zlib

from pyspark.sql import DataFrame

from ..formats import _decompress_capped

_ZIP_MAGIC = b"PK\x03\x04"
_GZ_MAGIC = b"\x1f\x8b"

def _is_tar(data: bytes) -> bool:
    return len(data) > 262 and data[257:262] == b"ustar"


def _members_zip(data, max_members, max_member_bytes, max_total_bytes):
    """Yield (name, blob, err); a final (None, None, msg) means the
    archive-level total cap stopped iteration early (real members
    always carry a name)."""
    total = 0
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        infos = [i for i in zf.infolist() if not i.is_dir()]
        for info in infos[:max_members]:
            if info.file_size > max_member_bytes:
                yield info.filename, None, (
                    f"member exceeds cap ({info.file_size} B)")
                continue
            # declared-size check against the archive budget BEFORE
            # inflating anything
            if total + info.file_size > max_total_bytes:
                yield None, None, (
                    f"archive total exceeds cap ({max_total_bytes} B); "
                    "remaining members skipped")
                return
            try:
                with zf.open(info) as fh:
                    # read bounded: file_size already checked, but a
                    # lying header still can't exceed cap + 1
                    blob = fh.read(max_member_bytes + 1)
            except Exception as exc:  # encrypted/corrupt member
                yield info.filename, None, f"{type(exc).__name__}: {exc}"
                continue
            if len(blob) > max_member_bytes:
                yield info.filename, None, "member exceeds cap"
            elif total + len(blob) > max_total_bytes:
                # header lied small; actual bytes blow the budget
                yield None, None, (
                    f"archive total exceeds cap ({max_total_bytes} B); "
                    "remaining members skipped")
                return
            else:
                total += len(blob)
                yield info.filename, blob, None


def _members_tar(data, max_members, max_member_bytes, max_total_bytes):
    total = 0
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        n = 0
        for info in tf:
            if not info.isfile():
                continue
            if n >= max_members:
                break
            n += 1
            if info.size > max_member_bytes:
                yield info.name, None, (
                    f"member exceeds cap ({info.size} B)")
                continue
            # tar content is size-delimited: the declared size IS the
            # read size, so the pre-read check is exact
            if total + info.size > max_total_bytes:
                yield None, None, (
                    f"archive total exceeds cap ({max_total_bytes} B); "
                    "remaining members skipped")
                return
            fh = tf.extractfile(info)
            if fh is None:
                yield info.name, None, "unreadable member"
                continue
            blob = fh.read(max_member_bytes + 1)
            if len(blob) > max_member_bytes:
                yield info.name, None, "member exceeds cap"
            else:
                total += len(blob)
                yield info.name, blob, None


def _member_gzip(data, cap):
    """All members of a (possibly concatenated) gzip stream under one
    shared cap — gunzip semantics: `cat a.gz b.gz` is one logical
    file. Reuses the WARC/extract multi-member walk."""
    return _decompress_capped(
        data, lambda: zlib.decompressobj(wbits=31), _GZ_MAGIC, cap=cap)


def unpack_archives(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    max_members: int = 10000,
    max_member_bytes: int = 64 * 1024 * 1024,
    max_total_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Explode archive rows into member rows. Output = input columns
    with `content` replaced by the member bytes, plus:
      member_name   member path inside the archive (NULL passthrough)
      member_index  0-based position (NULL passthrough)
      unpack_error  NULL, or why this member/container was skipped
    `path` for members becomes 'archive!member' (and `filename`, when
    present, the member's basename) so downstream extraction and
    routing see unique per-member identities.

    Bounds: `max_member_bytes` per member, `max_members` per archive,
    and `max_total_bytes` of decompressed payload per archive (on
    hitting it, members decoded so far are kept and one final marker
    row carries `unpack_error` — same skip-don't-fail posture as the
    per-member caps). A container that raises mid-iteration emits ONE
    error row and drops its partial members (atomicity)."""
    import pandas as pd

    cols = df.columns
    has_filename = "filename" in cols
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields]
    schema = ", ".join(fields + ["member_name string",
                                 "member_index int",
                                 "unpack_error string"])
    mm, mb = int(max_members), int(max_member_bytes)
    mt = int(max_total_bytes)
    out_cols = list(cols) + ["member_name", "member_index", "unpack_error"]

    def unpack_one(row):
        """Rows for ONE container, emitted atomically. Returns
        (rows, payload_bytes)."""
        data = row[content_col]
        data = bytes(data) if data is not None else b""
        base = dict(row)
        rows: list[dict] = []
        nbytes = 0

        def emit(name, blob, err, idx):
            nonlocal nbytes
            r = dict(base)
            if name is not None:
                r[path_col] = f"{row[path_col]}!{name}"
                if has_filename:
                    r["filename"] = name.rsplit("/", 1)[-1]
            r[content_col] = blob if blob is not None else b""
            nbytes += len(r[content_col])
            r["member_name"] = name
            r["member_index"] = idx
            r["unpack_error"] = err
            rows.append(r)

        try:
            if data.startswith(_ZIP_MAGIC) or _is_tar(data):
                gen = (_members_zip if data.startswith(_ZIP_MAGIC)
                       else _members_tar)
                i = 0
                for name, blob, err in gen(data, mm, mb, mt):
                    if name is None:
                        emit(None, b"", err, None)  # partial marker
                        break
                    emit(name, blob, err, i)
                    i += 1
                if i == 0 and not rows:
                    emit(None, b"", "empty archive", None)
            elif data.startswith(_GZ_MAGIC):
                name = row[path_col].rsplit("/", 1)[-1]
                if name.endswith(".gz"):
                    name = name[:-3]
                emit(name, _member_gzip(data, min(mb, mt)), None, 0)
            else:
                emit(None, data, None, None)  # passthrough
        except Exception as exc:   # damaged container: drop partials
            rows = []
            nbytes = 0
            emit(None, b"", f"{type(exc).__name__}: {exc}", None)
        return rows, nbytes

    def run(batches):
        for pdf in batches:
            buf: list[dict] = []
            buf_bytes = 0
            for _, row in pdf.iterrows():
                rows, nbytes = unpack_one(row)
                buf.extend(rows)
                buf_bytes += nbytes
                # flush so resident decoded payload stays ~one archive
                # budget, never the whole batch of decoded archives
                if buf_bytes >= mt:
                    yield pd.DataFrame(buf, columns=out_cols)
                    buf, buf_bytes = [], 0
            if buf:
                yield pd.DataFrame(buf, columns=out_cols)

    return df.mapInPandas(run, schema)
