"""Unit tests for the vendored clean-room protobuf mini-runtime
(vendor/google/protobuf) that unblocks transformWithStateInPandas in
containers without a protobuf install. Exercised here against the
REAL generated StateMessage_pb2 module from the PySpark install —
the same module the TWS Python worker imports."""

from __future__ import annotations

import pytest

from cdk_serverless_data_lake_sandbox_spark.compat import ensure_protobuf

ensure_protobuf()

try:  # real-protobuf installs also pass these tests
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
except ImportError:  # pragma: no cover
    pytest.skip("StateMessage_pb2 unavailable", allow_module_level=True)


def test_oneof_roundtrip_and_which():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert back.statefulProcessorCall.WhichOneof("method") == "setHandleState"
    assert back.statefulProcessorCall.setHandleState.state == sm.CREATED


def test_oneof_last_write_wins():
    call = sm.StatefulProcessorCall(setHandleState=sm.SetHandleState())
    req = sm.StateRequest(statefulProcessorCall=call)
    req2 = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"k")
        )
    )
    merged = sm.StateRequest()
    merged.ParseFromString(req.SerializeToString() + req2.SerializeToString())
    assert merged.WhichOneof("method") == "implicitGroupingKeyRequest"


def test_nested_attribute_write_attaches():
    cmd = sm.StateCallCommand()
    cmd.stateName = "totals"
    cmd.schema = '{"fields":[]}'
    cmd.ttl.durationMs = 1234
    out = sm.StateCallCommand()
    out.ParseFromString(cmd.SerializeToString())
    assert out.stateName == "totals"
    assert out.ttl.durationMs == 1234
    assert out.HasField("ttl")


def test_lazy_read_does_not_set_presence():
    cmd = sm.StateCallCommand()
    _ = cmd.ttl.durationMs  # read-only touch
    assert cmd.SerializeToString() == b""
    assert not cmd.HasField("ttl")


def test_default_scalars_skipped_but_oneof_members_kept():
    # scalar default outside a oneof: omitted from the wire
    resp = sm.StateResponse(statusCode=0)
    assert resp.SerializeToString() == b""
    # message-typed oneof member with all-default content: still framed
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    data = req.SerializeToString()
    assert data != b""
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert (
        back.implicitGroupingKeyRequest.WhichOneof("method") == "removeImplicitKey"
    )


def test_repeated_bytes_roundtrip():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb", b""], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert list(back.value) == [b"a", b"bb", b""]
    assert back.requireNextFetch is True
    assert back.errorMessage == ""


def test_repeated_message_roundtrip():
    resp = sm.StateResponseWithTimer(statusCode=0)
    resp.timer.add(timestampMs=10)
    resp.timer.add(timestampMs=-5)
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [t.timestampMs for t in back.timer] == [10, -5]


def test_negative_int64_ten_byte_varint():
    t = sm.RegisterTimer(expiryTimestampMs=-1)
    data = t.SerializeToString()
    assert len(data) == 11  # tag + 10-byte two's-complement varint
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_unknown_fields_skipped():
    # craft bytes with an unknown field (nr 15, varint) prepended
    base = sm.SetImplicitKey(key=b"xyz").SerializeToString()
    data = bytes([15 << 3]) + b"\x07" + base
    m = sm.SetImplicitKey()
    m.ParseFromString(data)
    assert m.key == b"xyz"


def test_utf8_string_roundtrip():
    c = sm.StateCallCommand(stateName="état-ümläut-中文")
    back = sm.StateCallCommand()
    back.ParseFromString(c.SerializeToString())
    assert back.stateName == "état-ümläut-中文"
