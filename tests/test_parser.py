"""Adversarial command-parser + protocol-header tests (VERDICT r1 item 10).

The reference parses command strings with boost::program_options inside a
catch-all (main.cpp:36-187) and reads data_size blindly
(TCPInterface.cpp:45-50).  Our layer must never crash the session loop on
hostile input, and the acceptor must survive a poisoned connection.
"""

import socket
import threading
import time

import numpy as np
import pytest

from elevenrender_tpu.server.commands import CommandSession, parse_command_args
from elevenrender_tpu.server.protocol import (MESSAGE_HEADER_SIZE, Message,
                                              read_message, write_message)
from elevenrender_tpu.server.tcp import RenderServer


# ---- parse_command_args ----------------------------------------------------

def test_quoted_path_with_spaces():
    f = parse_command_args('--load_object --path "/tmp/my scene.obj"')
    assert "load_object" in f
    assert f["path"] == ["/tmp/my scene.obj"]


def test_unquoted_multiword_path_joins():
    f = parse_command_args("--load_object --path /tmp/my scene.obj")
    assert f["path"] == ["/tmp/my", "scene.obj"]  # joined later with " "


def test_value_starting_with_dashdash_starts_new_flag():
    f = parse_command_args("--get_pass --output")
    assert f["get_pass"] == []
    assert f["output"] == []


def test_repeated_flag_keeps_last():
    f = parse_command_args("--path a --path b")
    assert f["path"] == ["b"]


def test_unbalanced_quote_does_not_raise():
    f = parse_command_args('--path "unterminated')
    assert "path" in f


def test_bare_get_pass_binds_positional_value():
    f = parse_command_args("get_pass normal")
    assert f["get_pass"] == ["normal"]


def test_unknown_bare_word_is_inert():
    f = parse_command_args("frobnicate --start")
    assert "start" in f and "frobnicate" in f


# ---- CommandSession robustness ---------------------------------------------

class FakeTransport:
    def __init__(self):
        self.sent = []
        self.inbox = []

    def send(self, msg):
        self.sent.append(msg)

    def recv(self):
        return self.inbox.pop(0)


@pytest.mark.parametrize("cmd", [
    "frobnicate",                       # unknown command
    '--load_config --path "/nonexistent file.json"',  # missing file
    '--path "unterminated',             # unbalanced quote
    "--get_pass",                       # pass without renderer
    "--load_osl_material",              # declared-unhandled (parity no-op)
    "",                                  # empty command
    "-- --- ----",                       # flag soup
])
def test_session_survives_hostile_commands(cmd):
    t = FakeTransport()
    s = CommandSession(send=t.send, recv=t.recv)
    assert s.handle_command(cmd) is True  # session stays open


def test_malformed_json_payload_survives():
    t = FakeTransport()
    s = CommandSession(send=t.send, recv=t.recv)
    t.inbox.append(Message("data", "json", b"{not json"))
    assert s.handle_command("--load_config") is True


# ---- protocol header hardening ----------------------------------------------

def test_malformed_header_raises_valueerror():
    with pytest.raises(ValueError):
        Message.parse_header(b"\xff\xfegarbage" + b"\x00" * 1000)


def test_oversized_data_size_rejected():
    import json
    hdr = json.dumps({"type": "command", "data_format": "string",
                      "data_size": 1 << 60}).encode()
    with pytest.raises(ValueError):
        Message.parse_header(hdr + b"\x00" * (MESSAGE_HEADER_SIZE - len(hdr)))


def test_negative_data_size_rejected():
    import json
    hdr = json.dumps({"type": "command", "data_format": "string",
                      "data_size": -5}).encode()
    with pytest.raises(ValueError):
        Message.parse_header(hdr + b"\x00" * (MESSAGE_HEADER_SIZE - len(hdr)))


def test_non_object_header_rejected():
    hdr = b'[1, 2, 3]'
    with pytest.raises(ValueError):
        Message.parse_header(hdr + b"\x00" * (MESSAGE_HEADER_SIZE - len(hdr)))


# ---- acceptor survives a poisoned connection ---------------------------------

def test_server_survives_garbage_header_and_reaccepts():
    srv = RenderServer(host="127.0.0.1", port=5599)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    time.sleep(0.3)
    try:
        # Poison: garbage 1024-byte header after the handshake.
        c1 = socket.create_connection(("127.0.0.1", 5599), timeout=10)
        assert read_message(c1).get_string_data() == "ok"
        c1.sendall(b"\xde\xad" * (MESSAGE_HEADER_SIZE // 2))
        time.sleep(0.3)
        c1.close()

        # The acceptor must still serve a new, well-behaved client.
        c2 = socket.create_connection(("127.0.0.1", 5599), timeout=10)
        assert read_message(c2).get_string_data() == "ok"
        write_message(c2, Message.command("--get_info"))
        info = read_message(c2).get_json_data()
        assert info == {"samples": 0}
        write_message(c2, Message.close_session())
        c2.close()
    finally:
        srv.shutdown()
