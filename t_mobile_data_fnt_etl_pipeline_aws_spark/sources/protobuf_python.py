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
  * wire type 2 (LEN)     — string/bytes, varint length prefix; also
    NESTED MESSAGES (LEN-framed sub-message bytes) and PACKED repeated
    numerics (one LEN field holding concatenated scalar payloads — the
    proto3 default; unpacked form accepted on decode per the spec);
    repeated strings/messages repeat the tag per element;
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

import math as _math
import struct

VARINT, I64, LEN, I32 = 0, 1, 2, 5

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


def _kind_base(kind) -> str:
    return kind[0] if isinstance(kind, tuple) else kind


def _encode_scalar(kind: str, v, out: bytearray) -> None:
    """Tag-less payload encoding for one scalar value."""
    if kind == "int64":
        # proto wire: negative int64 is 10-byte two's-complement varint
        _write_varint(out, v & 0xFFFFFFFFFFFFFFFF)
    elif kind == "sint64":
        _write_varint(out, (v << 1) ^ (v >> 63))
    elif kind == "bool":
        _write_varint(out, 1 if v else 0)
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
    else:  # pragma: no cover - guarded by schema construction
        raise ValueError(f"unsupported scalar kind {kind!r}")


def _decode_scalar(kind: str, buf: bytes, pos: int):
    if kind == "int64":
        u, pos = _read_varint(buf, pos)
        return u - (1 << 64) if u >= 1 << 63 else u, pos
    if kind == "sint64":
        u, pos = _read_varint(buf, pos)
        return (u >> 1) ^ -(u & 1), pos
    if kind == "bool":
        u, pos = _read_varint(buf, pos)
        return u != 0, pos
    if kind == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind == "string":
        ln, pos = _read_varint(buf, pos)
        return buf[pos : pos + ln].decode("utf-8"), pos + ln
    if kind == "bytes":
        ln, pos = _read_varint(buf, pos)
        return bytes(buf[pos : pos + ln]), pos + ln
    raise ValueError(f"unsupported scalar kind {kind!r}")  # pragma: no cover


_PACKABLE = {"int64", "sint64", "bool", "double", "float"}


def _is_default(base: str, v) -> bool:
    """Proto3 default test with sign-aware zero compare: -0.0 == 0.0
    under ``==`` but is NOT the default and must be emitted (else it
    decodes back as +0.0 and flips sign under hash-compare oracles).
    The ``v == 0.0`` short-circuit keeps the hot encode path at one
    equality compare per field — the copysign bit test runs only for
    actual zeros (a per-field struct.pack bit compare measurably slowed
    the nested-envelope bench ~1.3×)."""
    if base in ("double", "float"):
        return v == 0.0 and _math.copysign(1.0, v) > 0.0
    return v == _DEFAULTS[base]


def encode_message(schema: dict, values: dict) -> bytes:
    """Encode one message. ``schema`` maps field name -> (field_number,
    kind), where kind is a scalar name, ("message", sub_schema), or
    ("repeated", inner_kind). Proto3 semantics: default-valued scalars,
    absent sub-messages, and empty repeateds are omitted from the wire;
    repeated numerics are PACKED (one LEN field holding concatenated
    payloads — the proto3 default), repeated strings/bytes/messages
    repeat the tag per element."""
    out = bytearray()
    for name, (num, kind) in schema.items():
        v = values.get(name)
        base = _kind_base(kind)
        if base == "message":
            # Only absence (None) omits a sub-message; a present-but-empty
            # dict {} must hit the wire as a zero-length LEN field so it
            # decodes back as {} rather than collapsing to None.
            if v is None:
                continue
            payload = encode_message(kind[1], v)
            _write_varint(out, (num << 3) | LEN)
            _write_varint(out, len(payload))
            out.extend(payload)
        elif base == "repeated":
            if not v:
                continue
            inner = kind[1]
            ibase = _kind_base(inner)
            if ibase in _PACKABLE:
                packed = bytearray()
                for elem in v:
                    _encode_scalar(ibase, elem, packed)
                _write_varint(out, (num << 3) | LEN)
                _write_varint(out, len(packed))
                out.extend(packed)
            elif ibase == "message":
                for elem in v:
                    payload = encode_message(inner[1], elem)
                    _write_varint(out, (num << 3) | LEN)
                    _write_varint(out, len(payload))
                    out.extend(payload)
            else:  # repeated string/bytes: one LEN field per element
                for elem in v:
                    _write_varint(out, (num << 3) | _WIRE[ibase])
                    _encode_scalar(ibase, elem, out)
        else:
            if v is None or _is_default(base, v):
                continue
            _write_varint(out, (num << 3) | _WIRE[base])
            _encode_scalar(base, v, out)
    return bytes(out)


def _default_for(kind):
    base = _kind_base(kind)
    if base == "repeated":
        return []
    if base == "message":
        return None
    return _DEFAULTS[base]


def _skip_field(wire: int, buf: bytes, pos: int) -> int:
    if wire == VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == I64:
        return pos + 8
    if wire == LEN:
        ln, pos = _read_varint(buf, pos)
        return pos + ln
    if wire == I32:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire}")


def _as_wanted(spec: dict) -> dict:
    """Accept a projection in either form: decode-form
    {field_number: (name, kind)} or encode-form {name: (number, kind)}
    (so a full schema can be passed as-is to decode everything)."""
    if spec and all(isinstance(k, str) for k in spec):
        return {num: (name, kind) for name, (num, kind) in spec.items()}
    return spec


def decode_message(buf: bytes, wanted: dict) -> dict:
    """Decode one message, materializing ONLY the fields in ``wanted``
    (field_number -> (name, kind) with the same kind grammar as
    encode_message — encode-form schemas are accepted too; a wanted
    ("message", sub_spec) projects into the sub-message recursively).
    All other fields are skipped structurally by wire type. Missing
    fields get proto3 defaults ([] for repeated, None for absent
    sub-messages). Packed AND unpacked encodings of repeated numerics
    are both accepted, per the spec."""
    wanted = _as_wanted(wanted)
    out = {name: _default_for(kind) for name, kind in wanted.values()}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 0x7
        spec = wanted.get(num)
        if spec is None:
            pos = _skip_field(wire, buf, pos)
            continue
        name, kind = spec
        base = _kind_base(kind)
        if base == "message":
            ln, pos = _read_varint(buf, pos)
            out[name] = decode_message(buf[pos : pos + ln], kind[1])
            pos += ln
        elif base == "repeated":
            inner = kind[1]
            ibase = _kind_base(inner)
            if ibase == "message":
                ln, pos = _read_varint(buf, pos)
                out[name].append(
                    decode_message(buf[pos : pos + ln], inner[1])
                )
                pos += ln
            elif ibase in _PACKABLE and wire == LEN:
                ln, pos = _read_varint(buf, pos)
                end = pos + ln
                while pos < end:
                    v, pos = _decode_scalar(ibase, buf, pos)
                    out[name].append(v)
            else:  # unpacked numeric, or string/bytes element
                v, pos = _decode_scalar(ibase, buf, pos)
                out[name].append(v)
        else:
            v, pos = _decode_scalar(base, buf, pos)
            out[name] = v
    return out
