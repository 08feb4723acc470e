"""Decoders: Confluent-framed Avro and proto2 LogLine bytes → records.

The consume half of wire parity — the reference's vendored client decodes
both framings (go-kafka-avro KafkaAvroDecoder at
avro_encoder_decoder.go:81-106; generated proto Unmarshal). These are the
exact inverses of encode/avro_binary.py and encode/proto_wire.py, used by
the Kafka *source* path (readStream.format("kafka") → decode value).
"""

from __future__ import annotations

import struct

from syslog_kafka_spark.encode.avro_binary import CONFLUENT_MAGIC


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def read_varint(self) -> int:
        shift = 0
        out = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def read_long(self) -> int:
        n = self.read_varint()
        return (n >> 1) ^ -(n & 1)  # un-zigzag

    def read_string(self) -> str:
        n = self.read_long()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def read_bytes(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b


def decode_logline(body: bytes) -> dict:
    """Inverse of encode_logline: Avro-binary LogLine body → dict."""
    r = _Reader(body)

    def union(reader):
        return None if r.read_long() == 0 else reader()

    line = union(r.read_string)
    source = union(r.read_string)

    def read_map() -> dict:
        out: dict[str, str] = {}
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:  # block with byte-size prefix
                count = -count
                r.read_long()
            for _ in range(count):
                # NB: read into temps — `d[f()] = g()` evaluates g() first,
                # which would swap key and value here.
                k = r.read_string()
                out[k] = r.read_string()

    tag = union(read_map)
    logtypeid = union(r.read_long)

    def read_timings() -> list:
        out = []
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:
                count = -count
                r.read_long()
            for _ in range(count):
                out.append({"eventName": r.read_string(), "value": r.read_long()})

    timings = union(read_timings)
    return {"line": line, "source": source, "tag": tag, "logtypeid": logtypeid, "timings": timings}


def decode_confluent(value: bytes) -> tuple[int, dict]:
    """[magic][schema id BE][avro body] → (schema_id, LogLine dict)."""
    if value[:1] != CONFLUENT_MAGIC:
        raise ValueError(f"bad magic byte {value[:1]!r} (expected 0x00)")
    (schema_id,) = struct.unpack(">I", value[1:5])
    return schema_id, decode_logline(value[5:])


def decode_logline_proto(data: bytes) -> dict:
    """Inverse of encode_logline_proto: proto2 LogLine bytes → dict."""
    r = _Reader(data)
    out: dict = {"line": None, "source": None, "tag": None, "logtypeid": None, "timings": None}
    end = len(data)
    while r.pos < end:
        key = r.read_varint()
        field_no, wire_type = key >> 3, key & 0x7
        if wire_type == 0:
            raw = r.read_varint()
            # int64 two's complement
            val = raw - (1 << 64) if raw >= (1 << 63) else raw
            if field_no == 4:
                out["logtypeid"] = val
            elif field_no == 5:
                out.setdefault("timings", None)
                out["timings"] = (out["timings"] or []) + [val]
        elif wire_type == 2:
            n = r.read_varint()
            payload = r.read_bytes(n)
            if field_no == 1:
                out["line"] = payload.decode()
            elif field_no == 2:
                out["source"] = payload.decode()
            elif field_no == 3:
                tr = _Reader(payload)
                k = v = None
                while tr.pos < len(payload):
                    tkey = tr.read_varint()
                    tn = tr.read_varint()
                    tval = tr.read_bytes(tn).decode()
                    if tkey >> 3 == 1:
                        k = tval
                    else:
                        v = tval
                out["tag"] = {**(out["tag"] or {}), k: v}
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
    return out
