"""Websocket transport for Request messages.

Reference spec: include/WebSocket.h — Boost.Beast async websocket client
`session` (strand-serialized write queue) and server `listener` +
`shared_state` broadcast.  Here: the `websockets` asyncio library wrapped
in daemon threads so the synchronous SLAM stack can call send() directly.
Payloads are binary msgpack Requests (the reference ships boost TEXT
archives — see PARITY.md).
"""
from __future__ import annotations

import asyncio
import threading
from typing import Callable

import websockets

from ..sync.codec import Request
from ..utils.logging import get_logger

_log = get_logger("ws")


class WsServer:
    """Accepts sessions; on_request(Request, reply_fn) handles messages;
    broadcast() reaches every connected session (shared_state::send)."""

    def __init__(self, host: str, port: int,
                 on_request: Callable[[Request, Callable[[Request], None]], None]):
        self.host = host
        self.port = port
        self.on_request = on_request
        self._sessions: set = set()
        self._loop: asyncio.AbstractEventLoop | None = None
        self._thread: threading.Thread | None = None
        self._started = threading.Event()
        self._server = None

    async def _handler(self, ws):
        self._sessions.add(ws)
        try:
            async for msg in ws:
                req = Request.decode(msg)

                def reply(r: Request, _ws=ws):
                    asyncio.run_coroutine_threadsafe(_ws.send(r.encode()), self._loop)

                self.on_request(req, reply)
        except websockets.ConnectionClosed:
            pass
        finally:
            self._sessions.discard(ws)

    def start(self):
        def run():
            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)

            async def main():
                self._server = await websockets.serve(
                    self._handler, self.host, self.port, max_size=1 << 30
                )
                self._started.set()
                await asyncio.Future()

            try:
                self._loop.run_until_complete(main())
            except asyncio.CancelledError:
                pass

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        if not self._started.wait(10):
            raise RuntimeError(f"ws server failed to bind {self.host}:{self.port}")

    def broadcast(self, req: Request):
        data = req.encode()
        for ws in list(self._sessions):
            asyncio.run_coroutine_threadsafe(ws.send(data), self._loop)

    def stop(self):
        if self._loop is not None:
            self._loop.call_soon_threadsafe(self._loop.stop)


class WsClient:
    """Persistent client session with a background receive loop."""

    def __init__(self, host: str, port: int,
                 on_request: Callable[[Request], None] | None = None):
        self.uri = f"ws://{host}:{port}"
        self.on_request = on_request
        self._loop: asyncio.AbstractEventLoop | None = None
        self._ws = None
        self._thread: threading.Thread | None = None
        self._connected = threading.Event()

    def connect(self, timeout: float = 10.0):
        def run():
            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)

            async def main():
                self._ws = await websockets.connect(self.uri, max_size=1 << 30)
                self._connected.set()
                try:
                    async for msg in self._ws:
                        if self.on_request is not None:
                            self.on_request(Request.decode(msg))
                except websockets.ConnectionClosed:
                    pass

            try:
                self._loop.run_until_complete(main())
            except asyncio.CancelledError:
                pass

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        if not self._connected.wait(timeout):
            raise ConnectionError(f"could not connect to {self.uri}")

    def send(self, req: Request):
        asyncio.run_coroutine_threadsafe(self._ws.send(req.encode()), self._loop)

    def close(self):
        if self._loop is not None and self._ws is not None:
            asyncio.run_coroutine_threadsafe(self._ws.close(), self._loop)


def ws_round_trip(host: str, port: int, req: Request, timeout: float = 10.0) -> Request:
    """One-shot synchronous request/reply on a fresh connection — the
    Register handshake (reference: ClientService::Register,
    ClientService.cc:113-172)."""

    async def go():
        async with websockets.connect(f"ws://{host}:{port}", max_size=1 << 30) as ws:
            await ws.send(req.encode())
            msg = await asyncio.wait_for(ws.recv(), timeout)
            return Request.decode(msg)

    return asyncio.run(go())
