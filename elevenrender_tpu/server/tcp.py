"""Headless TCP render server on port 5557.

Session-loop parity with /root/reference/src/main.cpp:190-240: accept one
client at a time, fresh CommandSession per connection, OK handshake on
connect, then read messages until a ``close_session`` status.  Client
disconnects are survived and the server re-accepts.

Run: ``python -m elevenrender_tpu.server.tcp [--port 5557]``.
"""

from __future__ import annotations

import socket

from ..utils.logging import get_logger
from .commands import CommandSession
from .protocol import Message, read_message, write_message

log = get_logger()

DEFAULT_PORT = 5557  # main.cpp:198


class RenderServer:
    def __init__(self, host: str = "0.0.0.0", port: int = DEFAULT_PORT):
        self.host = host
        self.port = port
        self._sock: socket.socket | None = None
        self._running = False

    def serve_forever(self) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self.port))
        self._sock.listen(1)
        self._running = True
        log.info("Acceptor started on %s:%d", self.host, self.port)

        while self._running:
            log.info("Awaiting for a connection")
            try:
                conn, addr = self._sock.accept()
            except OSError:
                break
            log.info("Connected: %s", addr)
            try:
                self.serve_client(conn)
            except (ConnectionError, OSError) as e:
                log.info("Client disconnected: %s", e)
            except ValueError as e:
                # Malformed/hostile header (protocol.parse_header): the
                # stream cannot be resynced — drop this client, keep
                # accepting.
                log.error("Protocol error, closing session: %s", e)
            finally:
                conn.close()
            log.info("Disconnected")

    def serve_client(self, conn: socket.socket) -> None:
        session = CommandSession(
            send=lambda msg: write_message(conn, msg),
            recv=lambda: read_message(conn))
        write_message(conn, Message.ok())  # handshake (main.cpp:211)

        while True:
            msg = read_message(conn)
            if msg.type == "command":
                session.handle_command(msg.get_string_data())
            elif msg.type == "status":
                if msg.get_string_data() == "close_session":
                    log.info("Closing session")
                    break
                log.error("Expected a command, got status: %s",
                          msg.get_string_data())
            else:
                log.error("Unexpected message type: %s", msg.type)

    def shutdown(self) -> None:
        self._running = False
        if self._sock is not None:
            self._sock.close()


def main() -> None:
    import argparse
    p = argparse.ArgumentParser(description="ElevenRender-TPU server")
    p.add_argument("--port", type=int, default=DEFAULT_PORT)
    p.add_argument("--host", default="0.0.0.0")
    args = p.parse_args()
    RenderServer(args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
