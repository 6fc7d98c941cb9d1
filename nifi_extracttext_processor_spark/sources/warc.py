"""WARC / WET web-archive source (ISO 28500) — the Common Crawl
ingestion path a 100 TB training-data pipeline starts from.

Reference parity: the NiFi flow's acquisition step is ListFile +
FetchFile over a documents directory (56409-tika.xml:2305-2342); a
web-corpus deployment of the same flow would list/fetch `.warc.gz`
segments instead. This module reads those segments distributed and
projects them into the same (id, url, text) document shape the rest of
the engine consumes.

Format notes (all public — ISO 28500 / WARC 1.1 spec, Common Crawl
docs):
  * A WARC file is a sequence of records: a `WARC/1.0` (or 1.1)
    version line, CRLF-separated named headers, a blank line, exactly
    `Content-Length` bytes of block, then CRLF CRLF.
  * Common Crawl `.warc.gz` / `.wet.gz` files are MULTI-MEMBER gzip
    streams — one gzip member per record — so a reader can resume at
    any member boundary. Python's `gzip.decompress` handles member
    concatenation natively; the parser here walks members with
    `zlib.decompressobj(wbits=31)` so each member is size-bounded as
    it inflates (same fail-closed posture as the PNG/TIFF bounded
    inflate in operators/multimodal.py).
  * `response` records carry an HTTP/1.1 message as their block:
    status line, headers, CRLF CRLF, payload.  `conversion` records
    (WET) carry extracted UTF-8 text directly.

100 TB design: a gzip stream is not splittable without an external
index, so the unit of parallelism is the FILE — exactly Common
Crawl's layout (~1 GiB per segment, ~80k segments per crawl), and
exactly what Spark's `binaryFile` source provides (one row per file,
one task per row after the scan's own partitioning). At 1000
executors the segment list fans out evenly with no shuffle; the parse
kernel streams each member and emits rows incrementally, so executor
memory is bounded by the largest single record (capped below), not
the file.
"""

from __future__ import annotations

import hashlib
import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# Hard ceiling on a single record block (default 100 MiB — generous:
# Common Crawl truncates response payloads at 1 MiB). A crafted
# Content-Length cannot commit more than this per record, and the
# per-member inflate is bounded to the declared length + header slack.
MAX_RECORD_BYTES = 100 << 20
# Header section ceiling (spec-ish: headers are small; 1 MiB is paranoid)
_MAX_HEADER_BYTES = 1 << 20


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Inflate a (possibly multi-member) gzip stream, yielding one
    bytes object per member. Each member's output is bounded at
    MAX_RECORD_BYTES + header slack; a member exceeding it raises
    ValueError (fail closed — no unbounded allocation from crafted
    high-ratio input)."""
    pos = 0
    n = len(data)
    bound = MAX_RECORD_BYTES + _MAX_HEADER_BYTES
    view = memoryview(data)  # zero-copy slicing: a 1 GiB segment has
    # tens of thousands of members, and data[pos:] would memcpy the
    # whole remaining buffer once per member (quadratic)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(view[pos:], bound + 1)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member: {exc}") from None
        if len(out) > bound:
            raise ValueError("gzip member exceeds WARC record budget")
        if not d.eof:
            raise ValueError("truncated gzip member")
        yield out
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:  # zero-progress guard
            raise ValueError("corrupt gzip stream")
        pos += consumed


def _parse_records(stream: bytes) -> Iterator[dict]:
    """Walk concatenated WARC records in an inflated byte stream.
    Yields one dict per record: {headers: {lower_name: value},
    block: bytes}. Structural damage (missing version line, absent or
    oversize Content-Length, truncated block) raises ValueError."""
    pos = 0
    n = len(stream)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and stream[pos:pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2 if stream[pos:pos + 2] == b"\r\n" else 1
        if pos >= n:
            return
        hdr_end = stream.find(b"\r\n\r\n", pos, pos + _MAX_HEADER_BYTES)
        if hdr_end < 0:
            raise ValueError("WARC record missing header terminator")
        head = stream[pos:hdr_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"bad WARC version line: {lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            if ":" not in ln:
                continue  # tolerate stray continuation junk
            k, v = ln.split(":", 1)
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length") \
                from None
        if clen < 0 or clen > MAX_RECORD_BYTES:
            raise ValueError(
                f"WARC Content-Length {clen} outside [0, "
                f"{MAX_RECORD_BYTES}]")
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("truncated WARC record block")
        yield {"headers": headers,
               "block": stream[body_start:body_start + clen]}
        pos = body_start + clen


def _parse_http_response(block: bytes) -> tuple[int | None, dict, bytes]:
    """Split an HTTP/1.x response message into (status, lower-cased
    headers, payload). A block that is not an HTTP message returns
    (None, {}, block) — some crawlers store raw payloads."""
    if not block.startswith(b"HTTP/"):
        return None, {}, block
    hdr_end = block.find(b"\r\n\r\n")
    if hdr_end < 0:
        return None, {}, block
    head = block[:hdr_end].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, block
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        if ":" in ln:
            k, v = ln.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    payload = _decode_transfer(block[hdr_end + 4:], headers)
    return status, headers, payload


def _dechunk(payload: bytes) -> bytes:
    """Reassemble a chunked Transfer-Encoding body (RFC 9112 §7.1):
    hex-size line, chunk bytes, CRLF, ... until a 0-size chunk.
    Raises ValueError on malformed framing (caller falls back to the
    raw bytes) and bounds total output at MAX_RECORD_BYTES."""
    out = bytearray()
    pos = 0
    n = len(payload)
    while True:
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("chunked body: missing size line")
        size_tok = payload[pos:eol].split(b";", 1)[0].strip()
        size = int(size_tok, 16)  # ValueError on junk → fallback
        if size < 0 or len(out) + size > MAX_RECORD_BYTES:
            raise ValueError("chunked body exceeds record bound")
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers, if any, are discarded
        if pos + size > n:
            raise ValueError("chunked body truncated")
        out += payload[pos:pos + size]
        pos += size
        if payload[pos:pos + 2] != b"\r\n":
            raise ValueError("chunked body: missing chunk CRLF")
        pos += 2


def _decode_transfer(payload: bytes, headers: dict[str, str]) -> bytes:
    """Undo transfer/content codings real Common Crawl response
    records carry: chunked Transfer-Encoding framing, then
    gzip/x-gzip/deflate Content-Encoding (bounded inflate). Anything
    we cannot decode (br, malformed streams) falls back to the bytes
    we have — crawl data is dirty; never fail the task over one
    page."""
    te = headers.get("transfer-encoding", "").lower()
    if "chunked" in te:
        try:
            payload = _dechunk(payload)
        except ValueError:
            pass
    ce = headers.get("content-encoding", "").strip().lower()
    if ce in ("gzip", "x-gzip", "deflate"):
        # wbits: 47 auto-detects zlib or gzip wrapping; raw deflate
        # (some servers send it despite the RFC) needs -15 — try both.
        for wbits in (47, -15):
            d = zlib.decompressobj(wbits=wbits)
            try:
                out = d.decompress(payload, MAX_RECORD_BYTES + 1)
                if len(out) > MAX_RECORD_BYTES:
                    break  # bomb — keep compressed bytes, fail closed
                return out
            except zlib.error:
                continue
    return payload


def _decode_charset(payload: bytes, content_type: str | None) -> str:
    """Decode text payload honoring a `charset=` parameter when present
    (default UTF-8, errors replaced — crawl data is dirty)."""
    enc = "utf-8"
    if content_type and "charset=" in content_type:
        cand = (content_type.split("charset=", 1)[1]
                .split(";")[0].strip().strip('"').strip("'"))
        try:
            io.TextIOWrapper(io.BytesIO(b""), encoding=cand)
            enc = cand
        except (LookupError, ValueError):
            # LookupError: unknown codec name. ValueError: names the
            # codec machinery rejects outright, e.g. an embedded NUL
            # ("utf-8\x00") — reachable because HTTP headers are
            # latin-1-decoded crawl bytes. Either way one hostile page
            # must not fail the task (errors-replace posture).
            pass
    return payload.decode(enc, "replace")


def _is_textual(content_type: str) -> bool:
    """HTTP payload types whose bytes are document text: text/*, XML
    applications incl. application/xhtml+xml (a real, non-rare way
    HTML is served — dropping it would silently lose a whole content
    class), any +xml vocabulary, and JSON."""
    mt = content_type.split(";")[0].strip().lower()
    return (mt.startswith("text/")
            or mt in ("application/xhtml+xml", "application/xml",
                      "application/json")
            or mt.endswith("+xml") or mt.endswith("+json"))


def parse_warc(data: bytes) -> Iterator[dict]:
    """Parse WARC bytes — gzip multi-member, single-member, or plain —
    into flat record dicts:

      record_id, warc_type, target_uri, warc_date, content_type,
      http_status (response records, else None),
      payload (bytes: HTTP payload for responses, raw block otherwise),
      text (str: decoded payload for conversion/WET and text/* response
            records, else None)
    """
    if data[:2] == b"\x1f\x8b":
        members: Iterator[bytes] = _split_gzip_members(data)
    else:
        members = iter((data,))
    for member in members:
        for rec in _parse_records(member):
            h = rec["headers"]
            wtype = h.get("warc-type", "")
            ctype = h.get("content-type")
            block = rec["block"]
            status: int | None = None
            payload = block
            text = None
            if wtype == "response" and ctype and \
                    ctype.startswith("application/http"):
                status, http_h, payload = _parse_http_response(block)
                pt = http_h.get("content-type", "")
                if _is_textual(pt):
                    text = _decode_charset(payload, pt)
            elif wtype == "conversion":
                text = _decode_charset(payload, ctype)
            yield {
                "record_id": h.get("warc-record-id", ""),
                "warc_type": wtype,
                "target_uri": h.get("warc-target-uri"),
                "warc_date": h.get("warc-date"),
                "content_type": ctype,
                "http_status": status,
                "payload": payload,
                "text": text,
            }


# ---------------------------------------------------------------------------
# writer (fixtures + roundtrip + MergeContent-style WARC sink)
# ---------------------------------------------------------------------------

def build_warc_record(
    warc_type: str,
    block: bytes,
    target_uri: str | None = None,
    record_id: str | None = None,
    warc_date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/octet-stream",
) -> bytes:
    """Serialize one WARC/1.0 record (spec §4): version line, named
    headers, blank line, block, record terminator."""
    # deterministic id over (type, uri, date, block) — two records
    # with identical payloads but different URIs must NOT collide
    rid = record_id or ("<urn:uuid:" + hashlib.md5(
        b"\x00".join((warc_type.encode(),
                      (target_uri or "").encode(),
                      warc_date.encode(), block))).hexdigest() + ">")
    lines = [b"WARC/1.0",
             b"WARC-Type: " + warc_type.encode(),
             b"WARC-Record-ID: " + rid.encode(),
             b"WARC-Date: " + warc_date.encode(),
             b"Content-Type: " + content_type.encode(),
             b"Content-Length: " + str(len(block)).encode()]
    if target_uri is not None:
        lines.insert(3, b"WARC-Target-URI: " + target_uri.encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"


def build_wet(docs: list[tuple[str, str]], gzip_members: bool = True,
              ) -> bytes:
    """Build a WET-style archive: one `conversion` record per (uri,
    text) pair, each its own gzip member when gzip_members (the Common
    Crawl framing), else plain concatenation."""
    import gzip as _gzip

    out = bytearray()
    for uri, text in docs:
        rec = build_warc_record(
            "conversion", text.encode("utf-8"), target_uri=uri,
            content_type="text/plain")
        out += _gzip.compress(rec, mtime=0) if gzip_members else rec
    return bytes(out)


def build_response_record(
    target_uri: str,
    payload: bytes,
    status: int = 200,
    http_content_type: str = "text/html; charset=utf-8",
    extra_http_headers: "dict[str, str] | None" = None,
) -> bytes:
    """Serialize a `response` record wrapping an HTTP/1.1 message.
    `extra_http_headers` lets fixtures carry transfer/content codings
    (Content-Encoding, Transfer-Encoding, ...)."""
    extras = "".join(f"{k}: {v}\r\n"
                     for k, v in (extra_http_headers or {}).items())
    http = (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"{extras}"
            f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1") + payload
    return build_warc_record(
        "response", http, target_uri=target_uri,
        content_type="application/http; msgtype=response")


# ---------------------------------------------------------------------------
# distributed reader
# ---------------------------------------------------------------------------

WARC_SCHEMA = ("path STRING, record_id STRING, warc_type STRING, "
               "target_uri STRING, warc_date STRING, "
               "content_type STRING, http_status INT, "
               "payload BINARY, text STRING")


def read_warc(spark: SparkSession, path: str,
              glob: str | None = None) -> DataFrame:
    """Distributed WARC/WET scan: `binaryFile` over the segment files
    (one task per segment — the gzip-member framing is walked inside
    the task), `mapInPandas` parse kernel, one output row per record.

    At Common Crawl scale the input listing is ~80k × ~1 GiB files per
    crawl; `binaryFile` partitions the listing across the cluster and
    no shuffle occurs — the parse is map-only. Follow with
    `warc_to_documents` to land in the engine's documents shape."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    return parse_warc_df(files)


def parse_warc_df(files: DataFrame, path_col: str = "path",
                  content_col: str = "content") -> DataFrame:
    """The parse kernel over an existing (path, content) frame —
    factored out so tests and in-memory roundtrips reuse the exact
    production code path."""
    import pandas as pd

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path", "record_id", "warc_type", "target_uri",
                "warc_date", "content_type", "http_status", "payload",
                "text"]
        for pdf in batches:
            rows = []
            for p, c in zip(pdf[path_col], pdf[content_col]):
                for rec in parse_warc(bytes(c or b"")):
                    rec["path"] = p
                    rows.append([rec[k] for k in cols])
            out = pd.DataFrame(rows, columns=cols)
            out["http_status"] = out["http_status"].astype("Int32") \
                if len(out) else out["http_status"]
            yield out

    return files.mapInPandas(_run, schema=WARC_SCHEMA)


def warc_to_documents(df: DataFrame) -> DataFrame:
    """Project parsed WARC records into the engine's documents shape:
    (doc_id BIGINT — xxhash64 over (record_id, target_uri, text):
    zero-shuffle, collision odds ~n²/2⁶⁴, and robust against
    non-conformant archives whose records all lack WARC-Record-ID
    (record_id '' alone would collide them) — url, text, n_chars).
    Keeps only records that carry text (WET conversion + text/*
    responses)."""
    from pyspark.sql import functions as F

    return (df.filter(F.col("text").isNotNull())
            .select(F.xxhash64("record_id", "target_uri", "text")
                    .alias("doc_id"),
                    F.col("target_uri").alias("url"),
                    "text",
                    F.length("text").alias("n_chars")))


# ---------------------------------------------------------------------------
# sitemap parsing (crawl URL discovery — sitemaps.org protocol)
# ---------------------------------------------------------------------------

def parse_sitemap(data: bytes) -> "list[dict]":
    """Parse a sitemaps.org XML document (urlset OR sitemapindex;
    gzip-transparent — sitemaps ship as .xml.gz) into
    [{loc, lastmod, kind}] where kind ∈ {url, sitemap}. Namespace-
    agnostic (matches on local tag names): real-world sitemaps mix
    default and prefixed namespaces freely. Structural damage raises
    ValueError (fail-closed like the WARC parser)."""
    import xml.etree.ElementTree as ET

    if data[:2] == b"\x1f\x8b":
        # BOUNDED inflate (same posture as _split_gzip_members): the
        # budget must bind BEFORE the output materializes, or a
        # crafted ~100 KB bomb expanding to GBs OOMs the task ahead
        # of any length check
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(data, MAX_RECORD_BYTES + 1)
        except zlib.error as exc:
            raise ValueError(f"corrupt sitemap gzip: {exc}") from None
        if len(data) > MAX_RECORD_BYTES:
            raise ValueError("sitemap exceeds record budget")
        if not d.eof:
            raise ValueError("truncated sitemap gzip")
    if len(data) > MAX_RECORD_BYTES:
        raise ValueError("sitemap exceeds record budget")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}") from None

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1].lower()

    rt = local(root.tag)
    if rt == "urlset":
        kind, entry_tag = "url", "url"
    elif rt == "sitemapindex":
        kind, entry_tag = "sitemap", "sitemap"
    else:
        raise ValueError(f"not a sitemap document: root <{rt}>")
    out = []
    for el in root:
        if local(el.tag) != entry_tag:
            continue
        loc = lastmod = None
        for ch in el:
            t = local(ch.tag)
            if t == "loc":
                loc = (ch.text or "").strip()
            elif t == "lastmod":
                lastmod = (ch.text or "").strip()
        if loc:
            out.append({"loc": loc, "lastmod": lastmod, "kind": kind})
    return out


def read_sitemaps(spark: SparkSession, path: str,
                  glob: str | None = "*.xml*") -> DataFrame:
    """Distributed sitemap scan → (path, loc, lastmod, kind) — the
    URL-frontier feed next to read_warc. Map-only; unparseable files
    fail the task (surface the damage) — pre-filter with a tolerant
    kernel if the input is untrusted bulk."""
    import pandas as pd

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")

    def _run(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                for rec in parse_sitemap(bytes(c or b"")):
                    rows.append([p, rec["loc"], rec["lastmod"],
                                 rec["kind"]])
            yield pd.DataFrame(
                rows, columns=["path", "loc", "lastmod", "kind"])

    return files.mapInPandas(
        _run, "path STRING, loc STRING, lastmod STRING, kind STRING")


# ---------------------------------------------------------------------------
# resumable batch ingestion (processed-segment catalog)
# ---------------------------------------------------------------------------

def ingest_warc_incremental(
    spark: SparkSession,
    segments_path: str,
    output_dir: str,
    catalog_dir: str,
    glob: str | None = "*.warc.gz",
    transform=None,
) -> int:
    """Idempotent batch ingestion: parse only segments whose path is
    NOT in the processed-path catalog, land their documents under
    `output_dir` PARTITIONED BY SEGMENT with dynamic partition
    overwrite, then record the paths. Returns the number of NEW
    segments processed.

    Idempotency does NOT rest on the two writes being atomic (they
    are not): documents are written to a per-segment partition
    (`segment=<xxhash64(path)>`) in dynamic-overwrite mode, so a
    failure between the docs write and the catalog append makes the
    next run RE-OVERWRITE exactly those partitions instead of
    appending duplicates. The catalog (one row per segment —
    ~80k/crawl, tiny) is read through tables.read_catalog, which
    bootstraps ONLY on genuine absence; a corrupt catalog raises
    instead of silently re-ingesting the corpus. `transform`
    (DataFrame → DataFrame over the parsed records) plugs pipeline
    stages in before the document projection."""
    from pyspark.sql import functions as F

    from .tables import read_catalog

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(segments_path).select("path", "content")
    done = read_catalog(spark, catalog_dir, ("path",))
    if done is not None:
        files = files.join(F.broadcast(done), "path", "left_anti")
    new_paths = [r["path"] for r in files.select("path").collect()]
    if not new_paths:
        return 0
    # pin the EXACT file set: re-reading the directory at parse time
    # could pick up segments that landed after the listing — they
    # would be ingested but not recorded, and re-ingested (duplicated)
    # on the next run
    pinned = (spark.read.format("binaryFile").load(new_paths)
              .select("path", "content"))
    parsed = parse_warc_df(pinned).withColumn(
        "segment", F.hex(F.xxhash64("path")))
    if transform is not None:
        parsed = transform(parsed)
    docs = (parsed
            .filter(F.col("text").isNotNull())
            .select(F.xxhash64("record_id", "target_uri", "text")
                    .alias("doc_id"),
                    F.col("target_uri").alias("url"),
                    "text",
                    F.length("text").alias("n_chars"),
                    "segment"))
    (docs.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("segment").parquet(output_dir))
    (spark.createDataFrame([(p,) for p in new_paths], "path string")
     .write.mode("append").parquet(catalog_dir))
    return len(new_paths)
