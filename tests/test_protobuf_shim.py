"""Vendored mini-protobuf runtime (vendor/google/protobuf): wire-format
unit tests against Spark's REAL generated StateMessage_pb2 module.

The end-to-end proof is test_stateful_streaming.py (the JVM parses our
serialized requests and we parse its responses through a live
transformWithStateInPandas query); these tests pin the codec properties
spark-free so failures localize: varint edges, negative int64, oneof
tagging of empty messages, repeated bytes/messages, auto-vivified
submessages, and unknown-field skipping.
"""

from __future__ import annotations

import os
import sys

import pytest


@pytest.fixture(scope="module")
def sm():
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        vendor = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")
        sys.path.insert(0, vendor)
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_handle_state_oneof_roundtrip(sm):
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        )
    )
    b = m.SerializeToString()
    # field 2 (statefulProcessorCall) > field 1 (setHandleState) > field 1
    # (state, varint 3): 0x12 len 0x0a len 0x08 0x03
    assert b == bytes.fromhex("12040a020803")
    m2 = sm.StateRequest()
    m2.ParseFromString(b)
    assert m2.statefulProcessorCall.setHandleState.state == 3


def test_empty_oneof_message_still_tagged(sm):
    """A oneof member that is an all-default message must reach the wire
    (tag + zero length) or the JVM cannot tell which branch was taken."""
    m = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    b = m.SerializeToString()
    assert b == bytes.fromhex("22021200")


def test_auto_vivified_submessage_serializes(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 2**40  # spans multiple varint bytes
    b = cmd.SerializeToString()
    back = sm.StateCallCommand()
    back.ParseFromString(b)
    assert back.stateName == "s" and back.ttl.durationMs == 2**40


def test_negative_int64_ten_byte_varint(sm):
    t = sm.TimerInfo(timestampMs=-1)
    b = t.SerializeToString()
    # field 2 varint of -1 = 10 bytes of 0xff..0x01
    assert b == bytes.fromhex("10ffffffffffffffffff01")
    back = sm.TimerInfo()
    back.ParseFromString(b)
    assert back.timestampMs == -1


def test_repeated_bytes_and_messages(sm):
    lp = sm.ListStatePut(value=[b"", b"x", b"yz"], fetchWithArrow=True)
    back = sm.ListStatePut()
    back.ParseFromString(lp.SerializeToString())
    assert list(back.value) == [b"", b"x", b"yz"]
    assert back.fetchWithArrow is True

    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[sm.KeyAndValuePair(key=b"k1", value=b"v1"), sm.KeyAndValuePair(key=b"k2")],
        requireNextFetch=True,
    )
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [(b"k1", b"v1"), (b"k2", b"")]
    assert back2.requireNextFetch is True


def test_defaults_and_unknown_fields(sm):
    r = sm.StateResponse()
    r.ParseFromString(b"")
    assert (r.statusCode, r.errorMessage, r.value) == (0, "", b"")
    # unknown field (number 15, varint) is skipped, known fields kept
    payload = bytes.fromhex("080c") + bytes.fromhex("7801")  # statusCode=12, field15=1
    r2 = sm.StateResponse()
    r2.ParseFromString(payload)
    assert r2.statusCode == 12


def test_utf8_string_roundtrip(sm):
    p = sm.ParseStringSchema(schema="naïve → schema ✓")
    back = sm.ParseStringSchema()
    back.ParseFromString(p.SerializeToString())
    assert back.schema == "naïve → schema ✓"
