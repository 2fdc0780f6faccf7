"""Unit tests for the vendored mini google.protobuf runtime
(_vendor/protobuf_shim): wire-format bytes against the published
encoding spec, descriptor parsing of Spark's real generated
StateMessage module, and the message semantics the TWS state client
relies on. The end-to-end JVM round-trip is covered by
tests/test_pipeline_streaming.py::test_transform_with_state_agrees.
"""

import sys

import pytest

from end_to_end_database_pipeline_project_spark._vendor import (
    SHIM_DIR,
    ensure_protobuf,
)

ensure_protobuf()

from google.protobuf import _mini  # noqa: E402


def _has_real_protobuf() -> bool:
    import google.protobuf

    return not getattr(google.protobuf, "__version__", "").endswith("-mini")


pytestmark = pytest.mark.skipif(
    _has_real_protobuf(), reason="real protobuf wheel installed; shim inactive"
)


# ------------------------------------------------------- wire format


def test_varint_spec_bytes():
    # the canonical example from the encoding docs: field 1, varint 150
    out = bytearray()
    _mini._enc_varint(out, (1 << 3) | 0)
    _mini._enc_varint(out, 150)
    assert bytes(out) == b"\x08\x96\x01"
    val, pos = _mini._dec_varint(b"\x96\x01", 0)
    assert (val, pos) == (150, 2)


def test_negative_int64_is_ten_bytes():
    out = bytearray()
    _mini._enc_varint(out, -2)
    assert len(out) == 10  # two's complement 64-bit
    val, _ = _mini._dec_varint(bytes(out), 0)
    assert _mini._to_signed64(val) == -2


def test_zigzag():
    for v, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert _mini._zigzag_enc(v) == z
        assert _mini._zigzag_dec(z) == v


def test_truncated_inputs_raise():
    with pytest.raises(ValueError):
        list(_mini._iter_wire(b"\x08"))  # varint field, no value
    with pytest.raises(ValueError):
        list(_mini._iter_wire(b"\x12\x05ab"))  # len 5, only 2 bytes


# ------------------------------ real generated module (StateMessage)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_loads_spark_generated_module():
    sm = _sm()
    # module-level enum constants the state client reads
    assert sm.PRE_INIT == 0 and sm.CREATED == 1
    # descriptor globals the generated tail patches
    assert sm._STATEREQUEST.name == "StateRequest"
    assert hasattr(sm._STATEREQUEST, "_serialized_start")


def test_oneof_switching_matches_client_usage():
    sm = _sm()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.HasField("statefulProcessorCall")
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k")
    )
    # assigning another member of the oneof clears the first
    assert not req.HasField("statefulProcessorCall")
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"


def test_roundtrip_all_response_shapes():
    sm = _sm()
    cases = [
        sm.StateResponse(statusCode=1, errorMessage="boom", value=b"v"),
        sm.StateResponseWithLongTypeVal(statusCode=0, value=-77),
        sm.StateResponseWithStringTypeVal(statusCode=0, value="abc"),
        sm.StateResponseWithListGet(
            statusCode=0, value=[b"a", b"bc", b""], requireNextFetch=True
        ),
    ]
    for msg in cases:
        back = type(msg)()
        back.ParseFromString(msg.SerializeToString())
        assert back == msg


def test_proto3_defaults_not_serialized():
    sm = _sm()
    assert sm.StateResponse(statusCode=0, errorMessage="").SerializeToString() == b""
    # explicit zero still reads back as zero through the default path
    empty = sm.StateResponse()
    empty.ParseFromString(b"")
    assert empty.statusCode == 0 and empty.errorMessage == ""


def test_unknown_fields_skipped():
    sm = _sm()
    # field 999 varint, then a real statusCode=7
    payload = bytes([0xF8, 0x3E, 0x01]) + b"\x08\x07"
    msg = sm.StateResponse()
    msg.ParseFromString(payload)
    assert msg.statusCode == 7


def test_repeated_message_field_parses():
    sm = _sm()
    pair = sm.KeyAndValuePair(key=b"k1", value=b"v1")
    resp = sm.StateResponseWithMapIterator(
        statusCode=0, kvPair=[pair, sm.KeyAndValuePair(key=b"k2", value=b"v2")]
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_shim_dir_on_path_only_when_needed():
    assert SHIM_DIR in sys.path
    mode = ensure_protobuf()
    assert mode in ("native", "shim")


def test_nested_assignment_through_vivified_child():
    # the pyspark state client writes `cmd.ttl.durationMs = n` through
    # the auto-vivified child — the write must survive serialization
    sm = _sm()
    call = sm.StateCallCommand()
    call.stateName = "s"
    call.ttl.durationMs = 1234
    assert call.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(call.SerializeToString())
    assert back.HasField("ttl") and back.ttl.durationMs == 1234


def test_untouched_vivified_child_not_serialized():
    sm = _sm()
    call = sm.StateCallCommand()
    call.stateName = "s"
    _ = call.ttl  # read-only access vivifies but must not emit
    assert not call.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(call.SerializeToString())
    assert not back.HasField("ttl")


def test_wire_level_oneof_last_wins_for_message_members():
    # two members of the same oneof on the wire: parser keeps the LAST
    # (proto3), including for message-typed members
    sm = _sm()
    a = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    b = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"k")
        )
    )
    merged = sm.StateRequest()
    merged.MergeFromString(a.SerializeToString() + b.SerializeToString())
    assert merged.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert not merged.HasField("statefulProcessorCall")
    # re-serialization must not emit both members
    again = sm.StateRequest()
    again.ParseFromString(merged.SerializeToString())
    assert again.WhichOneof("method") == "implicitGroupingKeyRequest"
