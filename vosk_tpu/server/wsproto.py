"""Minimal RFC 6455 websocket implementation over asyncio streams (server +
client).  The image ships no `websockets` package; the transcriber's server
mode (reference python/vosk/transcriber/transcriber.py:51-72) and our server
need only text/binary frames, so this is a compact stdlib-only subset:
upgrade handshake, framing with client-side masking, close/ping/pong.
"""
from __future__ import annotations

import asyncio
import base64
import hashlib
import os
import struct
from urllib.parse import urlparse

_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BIN, OP_CLOSE, OP_PING, OP_PONG = 0x0, 0x1, 0x2, 0x8, 0x9, 0xA


class ConnectionClosed(Exception):
    pass


class WebSocket:
    def __init__(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter, mask: bool):
        self._r = reader
        self._w = writer
        self._mask = mask
        self._closed = False

    # ------------------------------------------------------------- send

    async def send(self, data) -> None:
        if isinstance(data, str):
            await self._send_frame(OP_TEXT, data.encode("utf-8"))
        else:
            await self._send_frame(OP_BIN, bytes(data))

    async def _send_frame(self, opcode: int, payload: bytes) -> None:
        if self._closed:
            raise ConnectionClosed()
        head = bytearray([0x80 | opcode])
        n = len(payload)
        mask_bit = 0x80 if self._mask else 0
        if n < 126:
            head.append(mask_bit | n)
        elif n < (1 << 16):
            head.append(mask_bit | 126)
            head += struct.pack(">H", n)
        else:
            head.append(mask_bit | 127)
            head += struct.pack(">Q", n)
        if self._mask:
            key = os.urandom(4)
            head += key
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        self._w.write(bytes(head) + payload)
        await self._w.drain()

    # ------------------------------------------------------------- recv

    async def recv(self):
        """Returns str (text frame) or bytes (binary). Raises
        ConnectionClosed on close."""
        buf = b""
        opcode0 = None
        while True:
            fin, opcode, payload = await self._recv_frame()
            if opcode == OP_PING:
                await self._send_frame(OP_PONG, payload)
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                self._closed = True
                try:
                    await self._send_frame(OP_CLOSE, b"")
                except Exception:  # noqa: BLE001
                    pass
                raise ConnectionClosed()
            if opcode in (OP_TEXT, OP_BIN):
                opcode0 = opcode
                buf = payload
            elif opcode == OP_CONT:
                buf += payload
            if fin:
                return buf.decode("utf-8") if opcode0 == OP_TEXT else buf

    async def _recv_frame(self):
        try:
            h = await self._r.readexactly(2)
        except (asyncio.IncompleteReadError, ConnectionResetError):
            self._closed = True
            raise ConnectionClosed() from None
        fin = bool(h[0] & 0x80)
        opcode = h[0] & 0x0F
        masked = bool(h[1] & 0x80)
        n = h[1] & 0x7F
        if n == 126:
            n = struct.unpack(">H", await self._r.readexactly(2))[0]
        elif n == 127:
            n = struct.unpack(">Q", await self._r.readexactly(8))[0]
        key = await self._r.readexactly(4) if masked else None
        payload = await self._r.readexactly(n) if n else b""
        if key:
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return fin, opcode, payload

    async def close(self) -> None:
        if not self._closed:
            self._closed = True
            try:
                await self._send_frame(OP_CLOSE, b"")
            except Exception:  # noqa: BLE001
                pass
        self._w.close()


# ---------------------------------------------------------------- server


async def server_handshake(reader, writer) -> WebSocket:
    request = b""
    while b"\r\n\r\n" not in request:
        chunk = await reader.read(4096)
        if not chunk:
            raise ConnectionClosed()
        request += chunk
    headers = {}
    for line in request.decode("latin1").split("\r\n")[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    key = headers.get("sec-websocket-key", "")
    accept = base64.b64encode(hashlib.sha1((key + _MAGIC).encode()).digest()).decode()
    writer.write(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
        ).encode("latin1")
    )
    await writer.drain()
    return WebSocket(reader, writer, mask=False)


async def serve(handler, host: str, port: int):
    """handler(ws) coroutine per connection. Returns asyncio server."""

    async def on_conn(reader, writer):
        try:
            ws = await server_handshake(reader, writer)
            await handler(ws)
        except ConnectionClosed:
            pass
        finally:
            try:
                writer.close()
            except Exception:  # noqa: BLE001
                pass

    return await asyncio.start_server(on_conn, host, port)


# ---------------------------------------------------------------- client


class _ClientCtx:
    def __init__(self, url: str):
        self.url = url
        self.ws: WebSocket | None = None

    async def __aenter__(self) -> WebSocket:
        u = urlparse(self.url)
        host, port = u.hostname or "localhost", u.port or 80
        reader, writer = await asyncio.open_connection(host, port)
        key = base64.b64encode(os.urandom(16)).decode()
        path = u.path or "/"
        writer.write(
            (
                f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode("latin1")
        )
        await writer.drain()
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = await reader.read(4096)
            if not chunk:
                raise ConnectionClosed()
            resp += chunk
        if b"101" not in resp.split(b"\r\n", 1)[0]:
            raise ConnectionClosed(f"handshake failed: {resp[:100]!r}")
        self.ws = WebSocket(reader, writer, mask=True)
        return self.ws

    async def __aexit__(self, *exc) -> None:
        if self.ws is not None:
            await self.ws.close()


def connect(url: str) -> _ClientCtx:
    return _ClientCtx(url)
