"""Wire-protocol unit tests (no sockets, no jit — fast)."""

import json

import numpy as np

from elevenrender_tpu.server.protocol import MESSAGE_HEADER_SIZE, Message


def test_header_roundtrip():
    msg = Message.command("--load_object --recompute_normals")
    hdr = msg.header_bytes()
    assert len(hdr) == MESSAGE_HEADER_SIZE
    parsed, size = Message.parse_header(hdr)
    assert parsed.type == "command"
    assert parsed.data_format == "string"
    assert size == len(msg.data)
    # Zero-padded (TCPInterface.cpp:11).
    assert hdr.endswith(b"\x00")


def test_header_fields_match_reference():
    """Header JSON keys/values as Managers.cpp:167-177."""
    msg = Message.float_data(np.zeros(8, np.float32), "float4")
    obj = json.loads(msg.header_bytes().split(b"\x00", 1)[0])
    assert set(obj) == {"type", "data_format", "data_size"}
    assert obj["type"] == "data"
    assert obj["data_format"] == "float4"
    assert obj["data_size"] == 32


def test_status_helpers():
    assert Message.ok().get_string_data() == "ok"
    assert Message.close_session().get_string_data() == "close_session"
    assert Message.ok().type == "status"


def test_json_payload():
    msg = Message.json_msg({"x_res": 640, "denoise": False})
    assert msg.get_json_data()["x_res"] == 640


def test_float_payload_roundtrip():
    arr = np.arange(12, dtype=np.float32)
    msg = Message.float_data(arr, "float3")
    np.testing.assert_array_equal(msg.get_float_data(), arr)


def test_oversize_header_rejected():
    msg = Message.json_msg({"k": "x" * 2000}, type="command")
    # Payload can be big; only the header is capped.
    assert len(msg.header_bytes()) == MESSAGE_HEADER_SIZE
