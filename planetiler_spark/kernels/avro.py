"""From-scratch Apache Avro binary codec + object container file reader/writer.

Implements the subset of the public Avro 1.11 specification that Apache
Iceberg's metadata layer uses (manifest files and manifest lists are Avro
object container files): null/boolean/int/long/float/double/bytes/string
primitives, records, enums, fixed, arrays, maps, and unions, with the
`null` and `deflate` (raw RFC 1951) block codecs. No avro library exists
in this container, and the encoding is tiny: zigzag varints, length-
prefixed byte strings, block-encoded collections, and a 16-byte sync
marker between file blocks.

Correctness is anchored to the spec's own worked examples (tested in
tests/test_iceberg.py): zigzag(-64) = 0x7f, "foo" = 06 66 6f 6f, the
record {a: 27, b: "foo"} = 36 06 66 6f 6f, the array [3, 27] = 04 06 36 00.

Extra JSON attributes in schemas (Iceberg's "field-id", "element-id",
"key-id", "logicalType", docs...) are ignored per the spec: unknown
attributes do not affect the binary encoding.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

__all__ = ["zigzag_encode", "zigzag_decode", "write_container",
           "read_container", "encode_datum", "decode_datum"]

MAGIC = b"Obj\x01"


# --- varint / zigzag ---------------------------------------------------------

def zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    z &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


# --- schema-driven datum codec ------------------------------------------------

def _named(schema):
    """Normalize a schema node: strings are primitive/named refs, dicts carry
    a `type` key (which may itself be a nested schema for wrapped types)."""
    if isinstance(schema, str):
        return schema, None
    if isinstance(schema, list):
        return "union", schema
    t = schema["type"]
    if isinstance(t, (dict, list)):
        # {"type": {...}} wrapper — unwrap one level
        return _named(t)
    return t, schema


def encode_datum(datum, schema, out: bytearray) -> None:
    t, node = _named(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if datum else 0)
    elif t in ("int", "long"):
        out += zigzag_encode(int(datum))
    elif t == "float":
        out += struct.pack("<f", float(datum))
    elif t == "double":
        out += struct.pack("<d", float(datum))
    elif t == "bytes":
        b = bytes(datum)
        out += zigzag_encode(len(b))
        out += b
    elif t == "string":
        b = str(datum).encode("utf-8")
        out += zigzag_encode(len(b))
        out += b
    elif t == "fixed":
        b = bytes(datum)
        if len(b) != node["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {node['size']}")
        out += b
    elif t == "enum":
        out += zigzag_encode(node["symbols"].index(datum))
    elif t == "union":
        branches = node if isinstance(node, list) else schema
        idx = _union_branch(datum, branches)
        out += zigzag_encode(idx)
        encode_datum(datum, branches[idx], out)
    elif t == "array":
        items = list(datum)
        if items:
            out += zigzag_encode(len(items))
            for it in items:
                encode_datum(it, node["items"], out)
        out += zigzag_encode(0)
    elif t == "map":
        entries = list(datum.items())
        if entries:
            out += zigzag_encode(len(entries))
            for k, v in entries:
                encode_datum(k, "string", out)
                encode_datum(v, node["values"], out)
        out += zigzag_encode(0)
    elif t == "record":
        for f in node["fields"]:
            name = f["name"]
            if isinstance(datum, dict) and name not in datum:
                # absent key encodes as null if the field is nullable
                encode_datum(None, f["type"], out)
            else:
                encode_datum(datum[name], f["type"], out)
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


def _union_branch(datum, branches) -> int:
    """Pick the union branch for a Python datum (null vs anything else is
    all Iceberg needs; fall back to first non-null branch)."""
    for i, b in enumerate(branches):
        bt, _ = _named(b)
        if datum is None and bt == "null":
            return i
    for i, b in enumerate(branches):
        bt, _ = _named(b)
        if bt != "null":
            return i
    raise ValueError("no matching union branch")


def decode_datum(schema, buf: bytes, pos: int):
    t, node = _named(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return zigzag_decode(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = zigzag_decode(buf, pos)
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
    if t == "fixed":
        n = node["size"]
        return bytes(buf[pos:pos + n]), pos + n
    if t == "enum":
        i, pos = zigzag_decode(buf, pos)
        return node["symbols"][i], pos
    if t == "union":
        branches = node if isinstance(node, list) else schema
        i, pos = zigzag_decode(buf, pos)
        return decode_datum(branches[i], buf, pos)
    if t == "array":
        out = []
        while True:
            n, pos = zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # negative count: block byte-size follows (skippable form)
                _, pos = zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = decode_datum(node["items"], buf, pos)
                out.append(v)
    if t == "map":
        out = {}
        while True:
            n, pos = zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                _, pos = zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = decode_datum("string", buf, pos)
                v, pos = decode_datum(node["values"], buf, pos)
                out[k] = v
    if t == "record":
        rec = {}
        for f in node["fields"]:
            rec[f["name"]], pos = decode_datum(f["type"], buf, pos)
        return rec, pos
    raise ValueError(f"unsupported avro type: {t!r}")


# --- object container files ----------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_container(path: str, schema: dict, records: list[dict],
                    codec: str = "deflate", sync: bytes | None = None,
                    extra_meta: dict[str, bytes] | None = None) -> None:
    """Write an Avro object container file: magic, metadata map
    (avro.schema + avro.codec + caller keys, e.g. Iceberg's manifest
    "schema"/"partition-spec"), sync marker, then one data block."""
    if sync is None:
        # deterministic per-path marker (no RNG in library code paths)
        sync = zlib.crc32(path.encode()).to_bytes(4, "little") * 4
    body = bytearray()
    for r in records:
        encode_datum(r, schema, body)
    block = bytes(body)
    if codec == "deflate":
        block = zlib.compress(block, 6)[2:-4]  # raw RFC1951: strip zlib wrapper
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec}")
    out = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    if extra_meta:
        meta.update(extra_meta)
    encode_datum(meta, _META_SCHEMA, out)
    out += sync
    if records:
        out += zigzag_encode(len(records))
        out += zigzag_encode(len(block))
        out += block
        out += sync
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


def read_container(path: str, with_meta: bool = False):
    """Read an Avro object container file -> (schema, records) or
    (schema, records, meta) with `with_meta`. Handles multiple data blocks
    and both supported codecs; validates magic and per-block sync markers."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta, pos = decode_datum(_META_SCHEMA, buf, 4)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = bytes(buf[pos:pos + 16])
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        n, pos = zigzag_decode(buf, pos)
        size, pos = zigzag_decode(buf, pos)
        block = bytes(buf[pos:pos + size])
        pos += size
        if buf[pos:pos + 16] != sync:
            raise ValueError(f"{path}: bad sync marker")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        bpos = 0
        for _ in range(n):
            rec, bpos = decode_datum(schema, block, bpos)
            records.append(rec)
    if with_meta:
        return schema, records, meta
    return schema, records
