"""Minimal Apache Avro container-file writer/reader, pure Python.

Implements exactly the subset of the Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) that Apache
Iceberg's metadata files use — manifest lists and manifests are Avro
object container files whose schemas are records built from:

    null boolean int long float double bytes string
    record array union fixed

plus named-type references and the ``null``/``deflate`` codecs.  Maps
do not appear: Iceberg encodes its int-keyed stats maps as arrays of
key/value records (spec: "Avro's map type is not used" for non-string
keys), so this module deliberately omits the Avro ``map`` and ``enum``
types.

Everything here is from the public Avro spec:

* binary encoding — int/long are zig-zag varints; float/double are
  little-endian IEEE; bytes/string are a long length + raw bytes;
  records are their fields in declaration order; arrays are a series
  of blocks (count, items..., terminated by count 0; a negative count
  is followed by the block's byte size and means |count| items);
  unions are a long branch index + the encoded branch value;
* container layout — magic ``Obj\\x01``, a file-metadata map holding
  at least ``avro.schema`` (JSON) and ``avro.codec``, a random 16-byte
  sync marker, then data blocks of (record count, byte length,
  possibly-compressed payload, sync marker);
* the ``deflate`` codec is RFC-1951 raw deflate (zlib with a -15
  window, no zlib header/checksum).

The writer and reader are schema-driven and generic: values are plain
Python dicts/lists/scalars shaped like the schema, so the Iceberg
layer (sources/iceberg_meta.py) owns the manifest schemas and this
module stays format-agnostic.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterable

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive binary encoding
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    """Zig-zag varint (spec: int and long share this encoding)."""
    u = (n << 1) ^ (n >> 63)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


# ---------------------------------------------------------------------------
# schema-driven value encoding
# ---------------------------------------------------------------------------


def _resolve(schema: Any, names: dict[str, Any]) -> Any:
    """Normalize a schema node: look up named-type references, unwrap
    {"type": "string"}-style wrappers, register new named types."""
    if isinstance(schema, str):
        if schema in names:
            return names[schema]
        return schema  # primitive name
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "fixed", "enum"):
            name = schema.get("name")
            if name and name not in names:
                names[name] = schema
        return schema
    return schema  # union (list)


def _encode(schema: Any, value: Any, out: io.BytesIO, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        idx, branch = _union_branch(schema, value, names)
        _write_long(out, idx)
        _encode(branch, value, out, names)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        if value is not None:
            raise TypeError(f"null schema got {value!r}")
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if t in ("int", "long"):
        _write_long(out, int(value))
        return
    if t == "float":
        out.write(struct.pack("<f", float(value)))
        return
    if t == "double":
        out.write(struct.pack("<d", float(value)))
        return
    if t == "bytes":
        _write_bytes(out, bytes(value))
        return
    if t == "string":
        _write_bytes(out, value.encode("utf-8"))
        return
    if t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} got {len(b)}")
        out.write(b)
        return
    if t == "record":
        for f in schema["fields"]:
            try:
                fv = value[f["name"]] if f["name"] in value else f.get("default")
            except TypeError:
                raise TypeError(f"record value must be a mapping, got {value!r}")
            _encode(f["type"], fv, out, names)
        return
    if t == "array":
        items = list(value or ())
        if items:
            _write_long(out, len(items))
            for it in items:
                _encode(schema["items"], it, out, names)
        _write_long(out, 0)
        return
    raise NotImplementedError(f"avro type not supported here: {t}")


def _union_branch(union: list, value: Any, names: dict) -> tuple[int, Any]:
    """Pick the union branch for a value.  Iceberg only uses
    ["null", T] optionals, so null-vs-not is the only distinction
    needed; for robustness a simple type match handles other shapes."""
    for i, branch in enumerate(union):
        b = _resolve(branch, names)
        bt = b if isinstance(b, str) else b["type"]
        if value is None and bt == "null":
            return i, b
        if value is not None and bt != "null":
            if _matches(b, value, names):
                return i, b
    raise TypeError(f"no union branch in {union} for {value!r}")


def _matches(schema: Any, value: Any, names: dict) -> bool:
    t = schema if isinstance(schema, str) else schema["type"]
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "boolean":
        return isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    return True


def _decode(schema: Any, buf: io.BytesIO, names: dict) -> Any:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range")
        return _decode(schema[idx], buf, names)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: _decode(f["type"], buf, names) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)  # block byte size — skip-ahead hint
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
    if t == "map":
        # real Iceberg writers MAY emit string-keyed maps in metadata;
        # decode them for read-compat even though we never write them
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
    raise NotImplementedError(f"avro type not supported here: {t}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_container(
    path: str,
    schema: dict,
    records: Iterable[dict],
    metadata: dict[str, bytes] | None = None,
    codec: str = "deflate",
) -> None:
    """Write an Avro object container file.  ``metadata`` values are
    raw bytes (Iceberg stores JSON strings there)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be null|deflate, got {codec}")
    names: dict[str, Any] = {}
    body = io.BytesIO()
    count = 0
    for rec in records:
        _encode(schema, rec, body, names)
        count += 1
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()

    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    # file-metadata map: one block then the 0 terminator
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    if count:
        _write_long(out, count)
        _write_bytes(out, payload)
        out.write(sync)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)


def read_container(path: str) -> tuple[dict, list[dict], dict[str, bytes]]:
    """→ (writer schema, records, file metadata)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    names: dict[str, Any] = {}
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        block = _read_bytes(buf)
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            block = zlib.decompressobj(-15).decompress(block)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(_decode(schema, bbuf, names))
    return schema, records, meta
