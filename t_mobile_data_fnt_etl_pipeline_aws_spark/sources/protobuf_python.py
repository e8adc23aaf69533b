"""Pure-Python Protocol Buffers wire-format codec.

Like ``from_avro`` (see sources/avro_python.py), Spark's
``from_protobuf``/``to_protobuf`` live in an external module
(``spark-protobuf_2.13``) whose jar this container's pyspark 4.1.2 does
not ship, and no ``google.protobuf`` wheel is installed (SURVEY §2.1
exclusion note). The protobuf WIRE FORMAT, however, is public and small
(https://protobuf.dev/programming-guides/encoding/), so this module
implements it directly for the scalar types an event feed needs:

  * wire type 0 (VARINT)  — int64/uint64/bool (little-endian 7-bit
    groups, high bit = continuation); sint64 adds zigzag;
  * wire type 1 (I64)     — double, 8-byte little-endian;
  * wire type 2 (LEN)     — string/bytes, varint length prefix;
  * wire type 5 (I32)     — float, 4-byte little-endian;
  * a field = tag varint ``(field_number << 3) | wire_type`` + payload;
    a message = concatenated fields (order-insensitive on decode).

Proto3 semantics are honored: scalar fields equal to their default
(0, 0.0, "", false) are OMITTED on encode and materialized back on
decode — the property that makes sparse event payloads cheap on the
wire.

The decoder takes a *projection*: only requested field numbers are
materialized; every other field is SKIPPED structurally (varints
consumed, LEN payloads jumped over by their length prefix) without
decoding — protobuf's column-pruning analogue, and the reason partial
decode of a wide message costs O(bytes skipped), not O(fields parsed).
Both halves run executor-side under mapInPandas (Arrow batches); no
row ever transits the driver.

Reference repo has no code (/root/reference/README.md:1-2); the
surface follows SURVEY §2.1's ingest-format contract.
"""

from __future__ import annotations

import struct

VARINT, I64, LEN, I32 = 0, 1, 2, 5

#: field spec: name -> (field_number, kind); kinds below
_KINDS = {"int64", "sint64", "bool", "double", "float", "string", "bytes"}

_WIRE = {
    "int64": VARINT,
    "sint64": VARINT,
    "bool": VARINT,
    "double": I64,
    "float": I32,
    "string": LEN,
    "bytes": LEN,
}

_DEFAULTS = {
    "int64": 0,
    "sint64": 0,
    "bool": False,
    "double": 0.0,
    "float": 0.0,
    "string": "",
    "bytes": b"",
}


def _write_varint(out: bytearray, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return acc, pos
        shift += 7


def encode_message(schema: dict[str, tuple[int, str]], values: dict) -> bytes:
    """Encode one message. ``schema`` maps field name -> (field_number,
    kind). Proto3: default-valued fields are omitted from the wire."""
    out = bytearray()
    for name, (num, kind) in schema.items():
        v = values.get(name)
        if v is None or v == _DEFAULTS[kind]:
            continue
        _write_varint(out, (num << 3) | _WIRE[kind])
        if kind == "int64":
            # proto wire: negative int64 is 10-byte two's-complement varint
            _write_varint(out, v & 0xFFFFFFFFFFFFFFFF)
        elif kind == "sint64":
            _write_varint(out, (v << 1) ^ (v >> 63))
        elif kind == "bool":
            _write_varint(out, 1)
        elif kind == "double":
            out.extend(struct.pack("<d", v))
        elif kind == "float":
            out.extend(struct.pack("<f", v))
        elif kind == "string":
            raw = v.encode("utf-8")
            _write_varint(out, len(raw))
            out.extend(raw)
        elif kind == "bytes":
            _write_varint(out, len(v))
            out.extend(v)
    return bytes(out)


def decode_message(
    buf: bytes, wanted: dict[int, tuple[str, str]]
) -> dict:
    """Decode one message, materializing ONLY the fields in ``wanted``
    (field_number -> (name, kind)); all other fields are skipped
    structurally by wire type. Missing fields get proto3 defaults."""
    out = {name: _DEFAULTS[kind] for name, kind in wanted.values()}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 0x7
        spec = wanted.get(num)
        if spec is None:  # skip without decoding
            if wire == VARINT:
                _, pos = _read_varint(buf, pos)
            elif wire == I64:
                pos += 8
            elif wire == LEN:
                ln, pos = _read_varint(buf, pos)
                pos += ln
            elif wire == I32:
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wire}")
            continue
        name, kind = spec
        if kind == "int64":
            u, pos = _read_varint(buf, pos)
            out[name] = u - (1 << 64) if u >= 1 << 63 else u
        elif kind == "sint64":
            u, pos = _read_varint(buf, pos)
            out[name] = (u >> 1) ^ -(u & 1)
        elif kind == "bool":
            u, pos = _read_varint(buf, pos)
            out[name] = u != 0
        elif kind == "double":
            out[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif kind == "float":
            out[name] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif kind == "string":
            ln, pos = _read_varint(buf, pos)
            out[name] = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        elif kind == "bytes":
            ln, pos = _read_varint(buf, pos)
            out[name] = bytes(buf[pos : pos + ln])
            pos += ln
    return out
