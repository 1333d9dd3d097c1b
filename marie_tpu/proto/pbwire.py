"""Minimal protobuf wire-format codec (varint + length-delimited).

Used to speak foreign protobuf protocols (etcd v3's ``etcdserverpb``)
without codegen: messages are dicts of ``field_number -> value(s)``.
Only the wire types the etcd API needs are implemented: varint (0) and
length-delimited (2).
"""

from typing import Dict, List, Tuple, Union

Value = Union[int, bytes, "Msg"]
Msg = Dict[int, Union[Value, List[Value]]]


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value &= (1 << 64) - 1  # two's-complement 64-bit
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def encode(msg: Msg) -> bytes:
    """Encode {field: value-or-list}. int -> varint; bytes/str -> bytes;
    dict -> nested message."""
    out = bytearray()
    for field in sorted(msg):
        values = msg[field]
        if not isinstance(values, list):
            values = [values]
        for value in values:
            if isinstance(value, bool):
                value = int(value)
            if isinstance(value, int):
                _write_varint(out, (field << 3) | 0)
                _write_varint(out, value)
            else:
                if isinstance(value, dict):
                    value = encode(value)
                elif isinstance(value, str):
                    value = value.encode()
                _write_varint(out, (field << 3) | 2)
                _write_varint(out, len(value))
                out.extend(value)
    return bytes(out)


def decode(data: bytes) -> Dict[int, List[Value]]:
    """Decode into {field: [raw values]}; length-delimited fields stay
    bytes (call decode() again for nested messages)."""
    out: Dict[int, List[Value]] = {}
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            value, pos = _read_varint(data, pos)
        elif wire == 2:
            length, pos = _read_varint(data, pos)
            value = data[pos : pos + length]
            pos += length
        elif wire == 5:  # fixed32 (skip)
            value = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        elif wire == 1:  # fixed64 (skip)
            value = int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        out.setdefault(field, []).append(value)
    return out


def first(msg: Dict[int, List[Value]], field: int, default=None):
    values = msg.get(field)
    return values[0] if values else default
