"""Test-support fixtures: a localhost static-site HTTP server.

The reference ships a test ``httpserver`` for exactly this purpose
(test/Makefile, test/system): crawling real sockets without the
internet.  ``StaticSiteServer`` serves per-host page maps + robots.txt
bodies on one listening port; virtual hosts are separated by the Host
header, so a ``resolve`` map pointing every fixture host at
("127.0.0.1", port) gives a multi-host web on one socket.
"""

from __future__ import annotations

import asyncio
import threading
import time


class StaticSiteServer:
    """Threaded asyncio HTTP/1.1 server for {host: {path: html}} sites.

    ``robots``: {host: robots.txt body} (absent host → 404 robots =
    allow-all).  Records every hit as (monotonic_s, host, path).
    """

    def __init__(
        self,
        sites: dict,
        robots: dict | None = None,
        last_modified: str | None = None,
    ):
        self.sites = sites
        self.robots = robots or {}
        # when set, pages carry this Last-Modified header and a request
        # with If-Modified-Since answers 304 (fixture content never
        # changes) — exercises the conditional-GET respider path
        self.last_modified = last_modified
        self.hits: list = []
        self.ims_hits: list = []  # (host, path) of conditional GETs
        self.loop = None
        self.port = None
        self._ready = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> "StaticSiteServer":
        self._thread.start()
        assert self._ready.wait(5), "fixture server failed to start"
        return self

    def stop(self) -> None:
        if self.loop is not None:
            self.loop.call_soon_threadsafe(self.loop.stop)
            self._thread.join(5)

    def resolve_map(self) -> dict:
        """host → (addr, port) for HttpFetchStage."""
        return {h: ("127.0.0.1", self.port) for h in set(self.sites) | set(self.robots)}

    def _run(self) -> None:
        self.loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self.loop)
        srv = self.loop.run_until_complete(
            asyncio.start_server(self._handle, "127.0.0.1", 0)
        )
        self.port = srv.sockets[0].getsockname()[1]
        self._ready.set()
        self.loop.run_forever()

    @staticmethod
    def _resp(
        status: int, body: bytes = b"", ctype: str = "text/html", extra: str = ""
    ) -> bytes:
        reason = {200: "OK", 304: "Not Modified", 404: "Not Found"}.get(
            status, "OK"
        )
        return (
            f"HTTP/1.1 {status} {reason}\r\nContent-Type: {ctype}\r\n"
            f"{extra}Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body

    async def _handle(self, reader, writer):
        try:
            head = await reader.readuntil(b"\r\n\r\n")
        except (asyncio.IncompleteReadError, ConnectionError):
            writer.close()
            return
        lines = head.decode("latin-1").split("\r\n")
        path = lines[0].split()[1]
        host = ""
        for ln in lines[1:]:
            if ln.lower().startswith("host:"):
                host = ln.split(":", 1)[1].strip().split(":")[0]
        self.hits.append((time.monotonic(), host, path))
        if path == "/robots.txt":
            txt = self.robots.get(host)
            if txt is None:
                writer.write(self._resp(404))
            else:
                writer.write(self._resp(200, txt.encode(), "text/plain"))
        else:
            page = self.sites.get(host, {}).get(path)
            has_ims = any(
                ln.lower().startswith("if-modified-since:") for ln in lines[1:]
            )
            if has_ims:
                self.ims_hits.append((host, path))
            if page is None:
                writer.write(self._resp(404))
            elif self.last_modified and has_ims:
                writer.write(self._resp(304))
            else:
                lm = (
                    f"Last-Modified: {self.last_modified}\r\n"
                    if self.last_modified
                    else ""
                )
                writer.write(self._resp(200, page.encode(), extra=lm))
        try:
            await writer.drain()
        except ConnectionError:
            pass
        writer.close()
