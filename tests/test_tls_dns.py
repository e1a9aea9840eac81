"""HTTPS fetch tier + async caching DNS resolver.

TLS: self-signed localhost fixture (the reference serves/fetches https
via its ssl tcp server, HttpServer.h:138-143; https URL routing
Msg13.cpp:2376-2380).  Covers a verified https GET (SNI = URL host while
connecting to a resolved address), cert-verification failure mapping to
the permanent ``ERR_TLS`` (reference ESSLERROR, Errno.h:152), and
scheme-aware robots fetch.

DNS: ``DnsCache`` semantics per Dns.cpp — positive/negative caching
(1-day TTL, Dns.h:26; cached EDNSTIMEDOUT, Dns.cpp:351), in-flight
duplicate-request chaining (Dns.cpp:365-380), LRU bound, literal-IP
passthrough (Dns.cpp:340) — and the e2e seam: a DNS failure in the
fetch stage produces ``ERR_DNS``, a tmp error, so the
``errorcount>=1 && hastmperror`` reschedule rule fires.
"""

import asyncio
import datetime
import ssl
import threading
import time

import pyarrow as pa
import pytest

from open_source_search_engine_ray.functions.urlfilter import (
    ERR_DNS,
    ERR_NONE,
    ERR_TLS,
    TMP_ERROR_CODES,
    FilterProgram,
    candidate_columns,
    default_web_rules,
)
from open_source_search_engine_ray.stages.dnscache import DnsCache
from open_source_search_engine_ray.stages.httpfetch import HttpFetchStage

PAGE = "<html><head><title>S</title></head><body>secure fixture</body></html>"

ROBOTS_TLS = "User-agent: *\nDisallow: /private\n"


@pytest.fixture(scope="module")
def tls_files(tmp_path_factory):
    """Self-signed cert for DNS name tls.test (SAN-matched, so the
    client's default hostname check passes against the URL host)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    d = tmp_path_factory.mktemp("tls")
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "tls.test")])
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
            x509.SubjectAlternativeName([x509.DNSName("tls.test")]),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    certfile = d / "cert.pem"
    keyfile = d / "key.pem"
    certfile.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyfile.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    return str(certfile), str(keyfile)


class _TlsServer:
    """Threaded asyncio HTTPS fixture server."""

    def __init__(self, certfile, keyfile):
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(certfile, keyfile)
        self._ctx = ctx
        self.counts = {}
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
            asyncio.start_server(self._handle, "127.0.0.1", 0, ssl=self._ctx)
        )
        self.port = srv.sockets[0].getsockname()[1]
        self._ready.set()
        self.loop.run_forever()

    async def _handle(self, reader, writer):
        try:
            head = await reader.readuntil(b"\r\n\r\n")
        except (asyncio.IncompleteReadError, ConnectionError, ssl.SSLError):
            writer.close()
            return
        path = head.decode("latin-1").split("\r\n")[0].split()[1]
        self.counts[path] = self.counts.get(path, 0) + 1
        if path == "/robots.txt":
            body = ROBOTS_TLS.encode()
            ctype = "text/plain"
        else:
            body = PAGE.encode()
            ctype = "text/html"
        writer.write(
            (
                f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            + body
        )
        try:
            await writer.drain()
        except ConnectionError:
            pass
        writer.close()


@pytest.fixture(scope="module")
def tls_server(tls_files):
    srv = _TlsServer(*tls_files).start()
    yield srv
    srv.stop()


def _batch(urls, host, ip):
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array([host] * len(urls), pa.string()),
            "first_ip": pa.array([ip] * len(urls), pa.int64()),
            "launch_ms": pa.array([1000] * len(urls), pa.int64()),
        }
    )


def _client_ctx(certfile):
    return ssl.create_default_context(cafile=certfile)


def test_https_fetch_and_scheme_aware_robots(tls_server, tls_files):
    st = HttpFetchStage(
        resolve={"tls.test": ("127.0.0.1", tls_server.port)},
        ssl_context=_client_ctx(tls_files[0]),
        connect_timeout_s=3.0,
        read_timeout_s=3.0,
    )
    out = st(
        _batch(
            [
                f"https://tls.test:{tls_server.port}/a",
                f"https://tls.test:{tls_server.port}/private/x",
            ],
            "tls.test",
            41,
        )
    )
    status = out["http_status"].to_pylist()
    err = out["err_code"].to_pylist()
    assert status[0] == 200 and err[0] == ERR_NONE
    assert out["html"].to_pylist()[0] == PAGE
    # robots came over https from the same server and the Disallow took
    assert tls_server.counts.get("/robots.txt", 0) >= 1
    assert err[1] != ERR_NONE and status[1] == 0
    assert "/private/x" not in tls_server.counts


def test_https_cert_verify_failure_is_err_tls(tls_server):
    # default trust store does not contain the self-signed cert
    st = HttpFetchStage(
        resolve={"tls.test": ("127.0.0.1", tls_server.port)},
        connect_timeout_s=3.0,
        read_timeout_s=3.0,
    )
    out = st(
        _batch([f"https://tls.test:{tls_server.port}/a"], "tls.test", 42)
    )
    assert out["err_code"].to_pylist() == [ERR_TLS]
    # a cert failure is permanent: NOT a tmp error, so no hastmperror
    # reschedule (reference ESSLERROR is absent from Spider.cpp:2333-2344)
    assert ERR_TLS not in TMP_ERROR_CODES


# ---------------------------------------------------------------------------
# DnsCache unit semantics
# ---------------------------------------------------------------------------


def _run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def test_dns_cache_hit_and_negative_cache():
    calls = []

    async def lookup(host):
        calls.append(host)
        if host == "bad.test":
            raise OSError("NXDOMAIN")
        return "10.0.0.7"

    async def go():
        c = DnsCache(lookup=lookup)
        assert await c.resolve("ok.test") == ("10.0.0.7", ERR_NONE)
        assert await c.resolve("ok.test") == ("10.0.0.7", ERR_NONE)
        # negative answers cache too (Dns.cpp:351)
        assert await c.resolve("bad.test") == (None, ERR_DNS)
        assert await c.resolve("bad.test") == (None, ERR_DNS)
        return c

    c = _run(go())
    assert calls == ["ok.test", "bad.test"]  # one network lookup each
    assert c.lookups == 2 and c.hits == 2


def test_dns_cache_hostile_label_is_err_dns():
    """ADVICE r4 regression: getaddrinfo raises UnicodeError (a
    ValueError) for hosts with empty or >63-char labels; canonicalize
    admits such hosts, so one hostile outlink must NOT crash the fetch
    batch — it resolves to ERR_DNS like NXDOMAIN."""

    async def go():
        c = DnsCache()  # default getaddrinfo lookup
        assert await c.resolve("a" * 64 + ".test") == (None, ERR_DNS)
        assert await c.resolve("a..test") == (None, ERR_DNS)
        # and the negative answer is cached
        assert await c.resolve("a" * 64 + ".test") == (None, ERR_DNS)
        return c

    c = _run(go())
    assert c.lookups == 2 and c.hits == 1


def test_dns_cache_inflight_dedup_and_timeout():
    calls = []

    async def lookup(host):
        calls.append(host)
        if host == "slow.test":
            await asyncio.sleep(1.0)  # > timeout_s
            return "10.9.9.9"
        await asyncio.sleep(0.05)
        return "10.0.0.8"

    async def go():
        c = DnsCache(lookup=lookup, timeout_s=0.2)
        # concurrent duplicate requests chain onto one lookup
        r = await asyncio.gather(*(c.resolve("dup.test") for _ in range(5)))
        assert all(x == ("10.0.0.8", ERR_NONE) for x in r)
        # timeout -> EDNSTIMEDOUT -> ERR_DNS, cached
        assert await c.resolve("slow.test") == (None, ERR_DNS)
        assert await c.resolve("slow.test") == (None, ERR_DNS)
        return c

    c = _run(go())
    assert calls.count("dup.test") == 1
    assert calls.count("slow.test") == 1
    assert ERR_DNS in TMP_ERROR_CODES


def test_dns_cache_expiry_lru_and_ip_literal():
    calls = []

    async def lookup(host):
        calls.append(host)
        return "10.1.1.1"

    async def go():
        c = DnsCache(lookup=lookup, ttl_s=0.05, max_entries=2)
        await c.resolve("a.test")
        time.sleep(0.06)  # TTL expiry forces a re-lookup
        await c.resolve("a.test")
        assert calls.count("a.test") == 2
        # LRU bound: filling past max_entries evicts the oldest
        await c.resolve("b.test")
        await c.resolve("c.test")
        assert len(c._cache) == 2 and "a.test" not in c._cache
        # literal IPs never hit the resolver (Dns.cpp:340)
        assert await c.resolve("10.2.3.4") == ("10.2.3.4", ERR_NONE)
        assert "10.2.3.4" not in calls

    _run(go())


def test_dns_failure_feeds_reschedule_rule():
    """e2e seam: resolver failure in the fetch stage -> ERR_DNS reply ->
    the errorcount>=1 && hastmperror retry rule (not force-delete)."""

    async def lookup(host):
        raise OSError("EDNSDEAD")

    st = HttpFetchStage(
        dns=DnsCache(lookup=lookup), connect_timeout_s=1.0, read_timeout_s=1.0
    )
    out = st(_batch(["http://gone.test/a"], "gone.test", 43))
    code = out["err_code"].to_pylist()[0]
    assert code == ERR_DNS and code in TMP_ERROR_CODES

    web = FilterProgram(default_web_rules())
    c = candidate_columns(1)
    c["url"][0] = "http://gone.test/a"
    c["tld"][0] = "test"
    c["lang"][0] = "en"
    c["in_sitelist"][0] = True
    c["had_reply"][0] = True
    c["err_count"][0] = 1
    c["err_code"][0] = code
    c["spidered_time"][0] = 10
    i = int(web.assign(c)[0])
    assert web.rules[i].expression == "errorcount>=1 && hastmperror"
    assert not web.force_delete[i]
