"""Pure-stdlib Apache Avro binary codec + object-container file I/O.

The reference flow merges records as Avro files and publishes
Avro-serialized records to Kafka (B13/B15 — 56409-tika.xml:1325,1329,
2583). Spark's `to_avro`/`from_avro` and the `avro` data source need
the spark-avro jar, which this container does not ship — so this module
implements the Avro 1.x *specification* (binary encoding + object
container files, null codec) from scratch, stdlib-only:

  * primitives: null, boolean, int, long (zigzag varint), float,
    double, string, bytes
  * complex: record, array, map, union
  * container files: magic `Obj\\x01`, avro.schema/avro.codec metadata
    map, record blocks with sync markers

Encoded bytes are spec-compliant: any Avro implementation (including
spark-avro, where available) reads files this module writes, and vice
versa for the supported types. Used by operators.batch/sinks for the
portable Avro path; the jar-backed path is preferred when
`sinks.connectors.avro_available` says so.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary encoding (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------


def encode_long(n: int) -> bytes:
    """Zigzag + variable-length base-128 little-endian."""
    n = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _resolve(schema: Any) -> Any:
    """Schema can be a type-name string or a dict with 'type'."""
    if isinstance(schema, str):
        return {"type": schema}
    return schema


def encode_value(schema: Any, value: Any) -> bytes:
    if isinstance(schema, list):  # union: long index + encoded branch
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return encode_long(i)
            if value is not None and bt != "null":
                return encode_long(i) + encode_value(branch, value)
        raise ValueError(f"value {value!r} fits no union branch {schema}")
    s = _resolve(schema)
    t = s["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return encode_long(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "string":
        raw = str(value).encode("utf-8")
        return encode_long(len(raw)) + raw
    if t == "bytes":
        raw = bytes(value)
        return encode_long(len(raw)) + raw
    if t == "record":
        return b"".join(encode_value(f["type"], value[f["name"]])
                        for f in s["fields"])
    if t == "array":
        if not value:
            return encode_long(0)
        body = b"".join(encode_value(s["items"], v) for v in value)
        return encode_long(len(value)) + body + encode_long(0)
    if t == "map":
        if not value:
            return encode_long(0)
        body = b"".join(
            encode_value("string", k) + encode_value(s["values"], v)
            for k, v in value.items())
        return encode_long(len(value)) + body + encode_long(0)
    raise NotImplementedError(f"avro type {t!r} unsupported")


def decode_value(schema: Any, buf: io.BytesIO) -> Any:
    if isinstance(schema, list):
        idx = decode_long(buf)
        return decode_value(schema[idx], buf)
    s = _resolve(schema)
    t = s["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return decode_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return buf.read(decode_long(buf)).decode("utf-8")
    if t == "bytes":
        return buf.read(decode_long(buf))
    if t == "record":
        return {f["name"]: decode_value(f["type"], buf)
                for f in s["fields"]}
    if t == "array":
        out = []
        while True:
            n = decode_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                decode_long(buf)
                n = -n
            out.extend(decode_value(s["items"], buf) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = decode_long(buf)
            if n == 0:
                return out
            if n < 0:
                decode_long(buf)
                n = -n
            for _ in range(n):
                k = decode_value("string", buf)
                out[k] = decode_value(s["values"], buf)
    raise NotImplementedError(f"avro type {t!r} unsupported")


# ---------------------------------------------------------------------------
# object container files (Avro spec §Object Container Files)
# ---------------------------------------------------------------------------


def _sync_marker(schema_json: str) -> bytes:
    """Deterministic 16-byte sync marker (md5 of the schema JSON) so
    reruns produce byte-identical files — idempotent task retries."""
    import hashlib
    return hashlib.md5(schema_json.encode()).digest()


def write_container(schema: dict, rows: list[dict],
                    records_per_block: int = 4096) -> bytes:
    """Serialize rows to a spec-compliant Avro object container file
    (null codec). Returns the file bytes."""
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = _sync_marker(schema_json)
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": b"null"}
    out += encode_long(len(meta))
    for k, v in meta.items():
        out += encode_value("string", k)
        out += encode_long(len(v)) + v
    out += encode_long(0)  # end of metadata map
    out += sync
    for start in range(0, len(rows), records_per_block):
        block = rows[start:start + records_per_block]
        body = b"".join(encode_value(schema, r) for r in block)
        out += encode_long(len(block)) + encode_long(len(body)) + body
        out += sync
    return bytes(out)


def read_container(data: bytes) -> tuple[dict, list[dict]]:
    """Parse an Avro object container file → (schema, rows)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = decode_long(buf)
        if n == 0:
            break
        if n < 0:
            decode_long(buf)
            n = -n
        for _ in range(n):
            k = decode_value("string", buf)
            meta[k] = buf.read(decode_long(buf))
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise NotImplementedError(f"avro codec {codec!r} unsupported")
    schema = json.loads(meta["avro.schema"].decode())
    sync = buf.read(16)
    rows: list[dict] = []
    while True:
        try:
            count = decode_long(buf)
        except EOFError:
            break
        size = decode_long(buf)
        block = io.BytesIO(buf.read(size))
        rows.extend(decode_value(schema, block) for _ in range(count))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch — corrupt container")
    return schema, rows


# ---------------------------------------------------------------------------
# Spark schema → Avro schema
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "long": "long", "integer": "int", "int": "int", "bigint": "long",
    "double": "double", "float": "float", "string": "string",
    "boolean": "boolean", "binary": "bytes",
}


def avro_schema_of(df, record_name: str = "PDF") -> dict:
    """Avro record schema for a DataFrame's (flat) schema; every field
    nullable (union with null) — matching InferAvroSchema's output shape
    for JSON-derived records (record name 'PDF', 56409-tika.xml:1650)."""
    fields = []
    for f in df.schema.fields:
        t = _SPARK_TO_AVRO.get(f.dataType.simpleString())
        if t is None:
            raise NotImplementedError(
                f"no avro mapping for column {f.name!r} type "
                f"{f.dataType.simpleString()!r}")
        fields.append({"name": f.name, "type": ["null", t]})
    return {"type": "record", "name": record_name, "fields": fields}
