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
import ssl
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
        ssl_ctx: ssl.SSLContext | None = None,
        port: int = 0,
    ):
        self.sites = sites
        self.robots = robots or {}
        self._ssl_ctx = ssl_ctx  # serve HTTPS when set
        self._want_port = port  # 0 = ephemeral; 80/443 for DNS-path runs
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
            asyncio.start_server(
                self._handle, "127.0.0.1", self._want_port, ssl=self._ssl_ctx
            )
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
        except (asyncio.IncompleteReadError, ConnectionError, ssl.SSLError):
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


class ForwardProxy:
    """A real localhost forward proxy: absolute-URI GET for plain HTTP
    (forwarded to the origin in origin-form), CONNECT tunneling for
    https.  ``ban_hosts``: hosts whose origin "banned this proxy's IP"
    — non-robots requests get 403 (the signal ipWasBanned keys on)."""

    def __init__(self, http_origin_port, tls_origin_port=None, ban_hosts=()):
        self.http_origin_port = http_origin_port
        self.tls_origin_port = tls_origin_port
        self.ban_hosts = set(ban_hosts)
        self.hits = []  # (method, host, path)
        self.auths = []  # Proxy-Authorization header values seen
        self.loop = None
        self.port = None
        self._ready = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        assert self._ready.wait(5)
        return self

    def stop(self):
        self.loop.call_soon_threadsafe(self.loop.stop)
        self._thread.join(5)

    def _run(self):
        self.loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self.loop)
        srv = self.loop.run_until_complete(
            asyncio.start_server(self._handle, "127.0.0.1", 0)
        )
        self.port = srv.sockets[0].getsockname()[1]
        self._ready.set()
        self.loop.run_forever()

    @staticmethod
    async def _pipe(reader, writer):
        try:
            while True:
                chunk = await reader.read(65536)
                if not chunk:
                    break
                writer.write(chunk)
                await writer.drain()
        except (ConnectionError, ssl.SSLError):
            pass
        try:
            writer.close()
        except Exception:
            pass

    async def _handle(self, reader, writer):
        try:
            head = await reader.readuntil(b"\r\n\r\n")
        except (asyncio.IncompleteReadError, ConnectionError):
            writer.close()
            return
        lines = head.decode("latin-1").split("\r\n")
        method, target = lines[0].split()[:2]
        for ln in lines[1:]:
            if ln.lower().startswith("proxy-authorization:"):
                self.auths.append(ln.split(":", 1)[1].strip())
        if method == "CONNECT":
            host = target.split(":")[0]
            self.hits.append(("CONNECT", host, ""))
            if host in self.ban_hosts or self.tls_origin_port is None:
                writer.write(b"HTTP/1.1 403 Forbidden\r\n\r\n")
                await writer.drain()
                writer.close()
                return
            up_r, up_w = await asyncio.open_connection(
                "127.0.0.1", self.tls_origin_port
            )
            writer.write(b"HTTP/1.1 200 Connection established\r\n\r\n")
            await writer.drain()
            await asyncio.gather(
                self._pipe(reader, up_w), self._pipe(up_r, writer)
            )
            return
        # absolute-URI GET: http://host[:port]/path
        rest = target.partition("://")[2]
        hostport, _, path = rest.partition("/")
        host = hostport.split(":")[0]
        path = "/" + path
        self.hits.append((method, host, path))
        if host in self.ban_hosts and path != "/robots.txt":
            writer.write(
                b"HTTP/1.1 403 Forbidden\r\nContent-Length: 0\r\n\r\n"
            )
            await writer.drain()
            writer.close()
            return
        up_r, up_w = await asyncio.open_connection(
            "127.0.0.1", self.http_origin_port
        )
        origin_form = "\r\n".join([f"{method} {path} HTTP/1.1"] + lines[1:])
        up_w.write(origin_form.encode("latin-1"))
        await up_w.drain()
        resp = await up_r.read(-1)
        up_w.close()
        writer.write(resp)
        try:
            await writer.drain()
        except ConnectionError:
            pass
        writer.close()


async def local_dns_lookup(host: str) -> str:
    """Fixture DNS lookup: every ``*.test`` host lives at 127.0.0.1,
    anything else is NXDOMAIN.  Module-level (picklable by reference)
    so a ``DnsCache(lookup=local_dns_lookup)`` instance can ride
    ``fetcher_kwargs`` into remote fetch actors — the bench exercises
    the REAL cache machinery (LRU, negative cache, in-flight dedup)
    against it."""
    if host.endswith(".test"):
        return "127.0.0.1"
    raise OSError(f"fixture NXDOMAIN: {host}")


def make_self_signed_cert(host: str, out_dir: str) -> tuple:
    """Write a SAN-matched self-signed cert+key for ``host`` into
    ``out_dir``; returns (certfile, keyfile).  The SAN entry makes the
    client's default hostname check pass, so ``ca_file=certfile`` is
    the only client-side trust override needed (same shape as the
    tests/test_tls_dns fixture)."""
    import datetime
    import os

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, host)])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(days=1))
        .not_valid_after(now + datetime.timedelta(days=365))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName(host)]), critical=False
        )
        .sign(key, hashes.SHA256())
    )
    certfile = os.path.join(out_dir, "cert.pem")
    keyfile = os.path.join(out_dir, "key.pem")
    with open(certfile, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(keyfile, "wb") as f:
        f.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
    return certfile, keyfile


def make_server_ssl_ctx(certfile: str, keyfile: str) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    return ctx
