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
  4 GB is skipped, not inflated), member-count cap, and gzip
  streamed through a bounded decompressobj. A damaged container
  emits ONE row with `unpack_error` set and empty content (the A6
  empty-content-on-failure posture) instead of failing the task.
- one level of unpacking per call (apply twice for nested archives —
  unbounded recursion inside a kernel is how bombs win).
"""

from __future__ import annotations

import io
import tarfile
import zipfile

from pyspark.sql import DataFrame

_ZIP_MAGIC = b"PK\x03\x04"
_GZ_MAGIC = b"\x1f\x8b"


def _is_tar(data: bytes) -> bool:
    return len(data) > 262 and data[257:262] == b"ustar"


def _members_zip(data, max_members, max_member_bytes):
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        infos = [i for i in zf.infolist() if not i.is_dir()]
        for info in infos[:max_members]:
            if info.file_size > max_member_bytes:
                yield info.filename, None, (
                    f"member exceeds cap ({info.file_size} B)")
                continue
            try:
                with zf.open(info) as fh:
                    # read bounded: file_size already checked, but a
                    # lying header still can't exceed cap + 1
                    blob = fh.read(max_member_bytes + 1)
                if len(blob) > max_member_bytes:
                    yield info.filename, None, "member exceeds cap"
                else:
                    yield info.filename, blob, None
            except Exception as exc:  # encrypted/corrupt member
                yield info.filename, None, f"{type(exc).__name__}: {exc}"


def _members_tar(data, max_members, max_member_bytes):
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
            fh = tf.extractfile(info)
            if fh is None:
                yield info.name, None, "unreadable member"
                continue
            blob = fh.read(max_member_bytes + 1)
            if len(blob) > max_member_bytes:
                yield info.name, None, "member exceeds cap"
            else:
                yield info.name, blob, None


def _member_gzip(data, max_member_bytes):
    import zlib
    obj = zlib.decompressobj(wbits=31)
    out = obj.decompress(data, max_member_bytes + 1)
    if len(out) > max_member_bytes:
        raise ValueError("gzip output exceeds cap")
    return out


def unpack_archives(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    max_members: int = 10000,
    max_member_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Explode archive rows into member rows. Output = input columns
    with `content` replaced by the member bytes, plus:
      member_name   member path inside the archive (NULL passthrough)
      member_index  0-based position (NULL passthrough)
      unpack_error  NULL, or why this member/container was skipped
    `path` for members becomes 'archive!member' (and `filename`, when
    present, the member's basename) so downstream extraction and
    routing see unique per-member identities."""
    import pandas as pd

    cols = df.columns
    has_filename = "filename" in cols
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields]
    schema = ", ".join(fields + ["member_name string",
                                 "member_index int",
                                 "unpack_error string"])
    mm, mb = int(max_members), int(max_member_bytes)

    def run(batches):
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                data = row[content_col]
                data = bytes(data) if data is not None else b""
                base = dict(row)

                def emit(name, blob, err, idx):
                    r = dict(base)
                    if name is not None:
                        r[path_col] = f"{row[path_col]}!{name}"
                        if has_filename:
                            r["filename"] = name.rsplit("/", 1)[-1]
                    r[content_col] = blob if blob is not None else b""
                    r["member_name"] = name
                    r["member_index"] = idx
                    r["unpack_error"] = err
                    out_rows.append(r)

                try:
                    if data.startswith(_ZIP_MAGIC):
                        i = 0
                        for name, blob, err in _members_zip(data, mm, mb):
                            emit(name, blob, err, i)
                            i += 1
                        if i == 0:
                            emit(None, b"", "empty archive", None)
                    elif _is_tar(data):
                        i = 0
                        for name, blob, err in _members_tar(data, mm, mb):
                            emit(name, blob, err, i)
                            i += 1
                        if i == 0:
                            emit(None, b"", "empty archive", None)
                    elif data.startswith(_GZ_MAGIC):
                        name = row[path_col].rsplit("/", 1)[-1]
                        if name.endswith(".gz"):
                            name = name[:-3]
                        emit(name, _member_gzip(data, mb), None, 0)
                    else:
                        emit(None, data, None, None)  # passthrough
                except Exception as exc:   # damaged container
                    emit(None, b"",
                         f"{type(exc).__name__}: {exc}", None)
            yield pd.DataFrame(out_rows, columns=list(pdf.columns)
                               + ["member_name", "member_index",
                                  "unpack_error"])

    return df.mapInPandas(run, schema)
