"""Pure-Python protobuf wire encoding for the EventMetadata bridge.

The reference serializes envelopes with protobuf on the wire
(config/KafkaConfig.java:73-75, 107-114; EventMetadata in
nnipa-protos common.proto:38-49). Spark's decode path is
``pyspark.sql.protobuf.functions.from_protobuf`` backed by the
spark-protobuf connector jar; the container here ships neither that
jar nor protoc, so this module provides the two artifacts the bridge
needs with zero dependencies:

  * :func:`encode_event_metadata` — encodes one metadata dict to
    protobuf wire bytes (the producer side / test-fixture generator);
  * :func:`event_metadata_descriptor_set` — a hand-assembled
    ``FileDescriptorSet`` (itself a protobuf message) describing the
    EventMetadata schema, i.e. what ``protoc --descriptor_set_out``
    would emit, suitable for ``from_protobuf(...,
    binaryDescriptorSet=...)``.

Both use only the public wire format: a field is a varint tag
``(field_number << 3) | wire_type`` followed by a varint (type 0) or a
length-delimited payload (type 2).

tests/test_protobuf_bridge.py proves encode→from_protobuf decode
parity when the connector jar is present and skips precisely when not.
"""

from __future__ import annotations

_WIRE_VARINT = 0
_WIRE_LEN = 2

# FieldDescriptorProto.Type values (descriptor.proto, public contract)
TYPE_INT32 = 5
TYPE_STRING = 9
_LABEL_OPTIONAL = 1


def _varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("negative varints not needed for this schema")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _WIRE_LEN) + _varint(len(payload)) + payload


def _str_field(field: int, value: str) -> bytes:
    return _len_field(field, value.encode("utf-8"))


def _int_field(field: int, value: int) -> bytes:
    return _tag(field, _WIRE_VARINT) + _varint(value)


# (name, field_number, type) — mirrors common.proto:38-49 minus the
# Timestamp/headers sub-messages (scalar projection of the contract;
# priority travels as its enum ordinal).
EVENT_METADATA_FIELDS = (
    ("event_id", 1, TYPE_STRING),
    ("correlation_id", 2, TYPE_STRING),
    ("source_service", 3, TYPE_STRING),
    ("version", 5, TYPE_INT32),
    ("tenant_id", 6, TYPE_STRING),
    ("user_id", 7, TYPE_STRING),
    ("priority", 8, TYPE_INT32),
    ("retry_count", 9, TYPE_INT32),
)

PACKAGE = "nnipa.events"
MESSAGE = "EventMetadata"
FULL_NAME = f"{PACKAGE}.{MESSAGE}"


def encode_event_metadata(meta: dict) -> bytes:
    """Encode one metadata record to protobuf wire bytes.

    proto3 omits default values (empty string / 0) on the wire; we do
    the same so round-tripped bytes are canonical.
    """
    out = bytearray()
    for name, number, ftype in EVENT_METADATA_FIELDS:
        value = meta.get(name)
        if ftype == TYPE_STRING:
            if value:
                out += _str_field(number, str(value))
        else:
            if value:
                out += _int_field(number, int(value))
    return bytes(out)


def _field_descriptor(name: str, number: int, ftype: int) -> bytes:
    # FieldDescriptorProto: name=1, number=3, label=4, type=5
    return (
        _str_field(1, name)
        + _int_field(3, number)
        + _int_field(4, _LABEL_OPTIONAL)
        + _int_field(5, ftype)
    )


def event_metadata_descriptor_set() -> bytes:
    """A serialized FileDescriptorSet for EventMetadata.

    FileDescriptorSet.file=1 -> FileDescriptorProto{name=1, package=2,
    message_type=4 -> DescriptorProto{name=1, field=2}, syntax=12}.
    """
    message = _str_field(1, MESSAGE) + b"".join(
        _len_field(2, _field_descriptor(n, num, t))
        for n, num, t in EVENT_METADATA_FIELDS
    )
    file_proto = (
        _str_field(1, "common.proto")
        + _str_field(2, PACKAGE)
        + _len_field(4, message)
        + _str_field(12, "proto3")
    )
    return _len_field(1, file_proto)
