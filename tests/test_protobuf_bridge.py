"""Protobuf bridge: pure-Python wire encode -> from_protobuf decode.

The reference's wire format is protobuf (config/KafkaConfig.java:73-75,
107-114). sources/proto_wire.py hand-encodes EventMetadata and its
FileDescriptorSet with zero dependencies; here we prove the bytes are
real protobuf by decoding them with Spark's connector when available.

The sandbox ships pyspark WITHOUT the spark-protobuf connector jar
(and no protoc / google.protobuf to cross-check), so the decode-parity
test skips precisely when the jar is absent — the wire bytes
themselves are still verified structurally below.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_service_spark.sources import proto_wire

ROWS = [
    {"event_id": "evt-1", "correlation_id": "corr-1",
     "source_service": "nnipa-click-service", "version": 2,
     "tenant_id": "tenant-3", "user_id": "user-17", "priority": 3,
     "retry_count": 1},
    # defaults (empty / zero) must be omitted on the wire
    {"event_id": "evt-2", "correlation_id": "", "source_service": "",
     "version": 0, "tenant_id": "tenant-0", "user_id": "", "priority": 0,
     "retry_count": 0},
]


def _read_fields(buf: bytes) -> dict[int, object]:
    """Minimal independent wire-format reader (varint + len-delimited)."""
    out: dict[int, object] = {}
    i = 0

    def varint() -> int:
        nonlocal i
        shift = val = 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    while i < len(buf):
        key = varint()
        field, wire = key >> 3, key & 7
        if wire == 0:
            out[field] = varint()
        elif wire == 2:
            n = varint()
            out[field] = buf[i:i + n]
            i += n
        else:  # pragma: no cover - schema uses only wire types 0 and 2
            raise AssertionError(f"unexpected wire type {wire}")
    return out


def test_encode_wire_structure():
    fields = _read_fields(proto_wire.encode_event_metadata(ROWS[0]))
    assert fields[1] == b"evt-1"
    assert fields[3] == b"nnipa-click-service"
    assert fields[5] == 2
    assert fields[8] == 3 and fields[9] == 1

    sparse = _read_fields(proto_wire.encode_event_metadata(ROWS[1]))
    # proto3 canonical: defaults omitted
    assert set(sparse) == {1, 6}


def test_descriptor_set_structure():
    ds = _read_fields(proto_wire.event_metadata_descriptor_set())
    file_proto = _read_fields(ds[1])
    assert file_proto[2] == b"nnipa.events"
    assert file_proto[12] == b"proto3"
    message = _read_fields(file_proto[4])
    assert message[1] == b"EventMetadata"


def test_from_protobuf_decode_parity(spark):
    """Decode parity via the spark-protobuf connector; skips with the
    exact import failure when the jar is not shipped."""
    df = spark.createDataFrame(
        [(r["event_id"], proto_wire.encode_event_metadata(r)) for r in ROWS],
        "id string, payload binary")
    try:
        from pyspark.sql.protobuf.functions import from_protobuf
        decoded = df.select(
            "id",
            from_protobuf(
                F.col("payload"), proto_wire.FULL_NAME,
                binaryDescriptorSet=proto_wire.event_metadata_descriptor_set(),
            ).alias("meta")).collect()
    except Exception as exc:  # connector jar absent in this container
        msg = str(exc)
        if "protobuf" in msg.lower() or "ClassNotFound" in msg:
            pytest.skip(f"spark-protobuf connector unavailable: {msg[:200]}")
        raise
    by_id = {row.id: row.meta for row in decoded}
    assert by_id["evt-1"].tenant_id == "tenant-3"
    assert by_id["evt-1"].version == 2
    assert by_id["evt-1"].priority == 3
    assert by_id["evt-2"].retry_count == 0  # proto3 default materializes


def test_pure_python_decode_roundtrip():
    """encode -> decode_event_metadata is the identity up to proto3
    default semantics (absent == '' / 0)."""
    for row in ROWS:
        wire = proto_wire.encode_event_metadata(row)
        assert proto_wire.decode_event_metadata(wire) == row


def test_decode_skips_unknown_fields_forward_compat():
    """Bytes from a NEWER writer (extra field numbers) must decode,
    ignoring the unknown fields by wire type — the compatibility
    property protobuf exists for."""
    wire = proto_wire.encode_event_metadata(ROWS[0])
    extra = (proto_wire._str_field(50, "future-string-field")
             + proto_wire._int_field(51, 99))
    assert proto_wire.decode_event_metadata(wire + extra) == ROWS[0]


def test_decode_metadata_column_spark(spark):
    """The jar-free Spark decode path: wire bytes column -> metadata
    struct columns via Arrow-batched mapInPandas, passthrough intact."""
    rows = [(i, proto_wire.encode_event_metadata(r))
            for i, r in enumerate(ROWS)]
    df = spark.createDataFrame(rows, "k long, wire binary")
    out = {r.k: r for r in
           proto_wire.decode_metadata_column(df, "wire").collect()}
    assert len(out) == len(ROWS)
    for i, want in enumerate(ROWS):
        got = out[i]
        assert got.k == i
        for name, _num, ftype in proto_wire.EVENT_METADATA_FIELDS:
            assert getattr(got, name) == want[name], name


def test_decode_int32_overflow_raises_and_negative_resigns():
    # ADVICE r3: a varint above 2^31-1 from a newer writer must fail
    # loudly, not wrap in a later astype('int32'); proto3 negatives
    # (10-byte two's-complement varints) must re-sign correctly.
    import pytest

    from event_streaming_service_spark.sources import proto_wire as pw

    def raw_varint(n):  # encoder rejects negatives; build bytes by hand
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | (0x80 if n else 0))
            if not n:
                return bytes(out)

    too_big = pw._tag(5, 0) + raw_varint(1 << 31)  # version field
    with pytest.raises(ValueError, match="overflows int32"):
        pw.decode_event_metadata(too_big)

    neg = pw._tag(9, 0) + raw_varint((1 << 64) - 3)  # retry_count = -3
    assert pw.decode_event_metadata(neg)["retry_count"] == -3


def test_decode_truncated_varint_raises_value_error():
    import pytest

    from event_streaming_service_spark.sources import proto_wire as pw

    with pytest.raises(ValueError, match="truncated varint"):
        pw.decode_event_metadata(b"\x08\xff")  # continuation bit, no next byte
    with pytest.raises(ValueError, match="varint too long"):
        pw.decode_event_metadata(b"\x08" + b"\xff" * 10 + b"\x01")
