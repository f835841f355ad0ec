"""Property tests for the RFC 6455 frame codec: any payload, any opcode,
masked or not, must round-trip byte-exactly — including the 126/65536
length-encoding boundaries and multi-frame streams."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from squonk2_fastapi_ws_event_stream_spark.streaming.websocket import (
    OP_BINARY,
    OP_CLOSE,
    OP_PING,
    OP_PONG,
    OP_TEXT,
    accept_key,
    close_payload,
    encode_frame,
    parse_close,
    read_frame,
)

OPCODES = (OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG)


@settings(max_examples=200, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=70_000),
    opcode=st.sampled_from(OPCODES),
    mask=st.booleans(),
)
def test_frame_roundtrip_any_payload(payload, opcode, mask):
    buf = io.BytesIO(encode_frame(opcode, payload, mask=mask))
    got_op, got_payload = read_frame(buf)
    assert got_op == opcode and got_payload == payload
    assert buf.read() == b""  # no trailing bytes consumed or left over


@settings(max_examples=50, deadline=None)
@given(
    frames=st.lists(
        st.tuples(
            st.binary(min_size=0, max_size=300),
            st.sampled_from(OPCODES),
            st.booleans(),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_frame_stream_roundtrip(frames):
    # Concatenated frames must parse back in order — framing is
    # self-delimiting, no sentinel needed.
    stream = b"".join(encode_frame(op, p, mask=m) for (p, op, m) in frames)
    buf = io.BytesIO(stream)
    for p, op, _m in frames:
        got_op, got_p = read_frame(buf)
        assert (got_op, got_p) == (op, p)


@settings(max_examples=100, deadline=None)
@given(code=st.integers(min_value=0, max_value=4999), reason=st.text(max_size=50))
def test_close_payload_roundtrip(code, reason):
    got_code, got_reason = parse_close(close_payload(code, reason))
    assert got_code == code and got_reason == reason


@settings(max_examples=100, deadline=None)
@given(key=st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=40))
def test_accept_key_deterministic_and_b64(key):
    import base64

    a1, a2 = accept_key(key), accept_key(key)
    assert a1 == a2
    assert len(base64.b64decode(a1)) == 20  # SHA-1 digest length
