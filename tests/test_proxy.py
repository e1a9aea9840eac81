"""Spider proxies: host-#0 allocation semantics + proxied downloads.

Unit coverage of :class:`state.proxy.ProxyAllocator` against
SpiderProxy.cpp's handleRequest54 (479-825): the single-proxy-per-site
rule while nothing is banned, the doubling ban-threshold ladder
(620-650), the min-in-flight / longest-idle winner scan (659-720), the
load-bucket lifecycle (expiry at LOADPOINT_EXPIRE_MS), and the ban
table keyed by (urlIp, proxyIp) (503-525).

End-to-end coverage through a real localhost forward proxy: plain-HTTP
absolute-URI GETs, ban-triggered rotation to the next proxy
(gotHttpReply9, Msg13.cpp:1040-1090), DELAYPERBAN self-imposed crawl
delay (Msg13.cpp:1991,2046-2052), CONNECT tunneling for https, and the
shared Ray broker actor used from a map_batches actor pool.
"""

import asyncio
import datetime
import ssl
import threading
import time

import pyarrow as pa
import pytest

from open_source_search_engine_ray.stages.httpfetch import HttpFetchStage
from open_source_search_engine_ray.state.proxy import (
    DELAYPERBAN_MS,
    LOADPOINT_EXPIRE_MS,
    ProxyAllocator,
    _ban_threshold,
    make_proxy_broker,
    parse_proxy_spec,
)

PAGE = "<html><head><title>P</title></head><body>proxied fixture</body></html>"


# ---------------------------------------------------------------------------
# allocator unit semantics
# ---------------------------------------------------------------------------


def test_ban_threshold_ladder():
    # the exact chain of SpiderProxy.cpp:620-657, including the clamp
    # and the irregular 255 rung
    expect = {
        0: 1, 1: 2, 2: 1, 3: 4, 4: 3, 5: 2, 6: 1,
        7: 8, 8: 7, 14: 1, 15: 16, 16: 15, 30: 1,
        31: 32, 62: 1, 63: 64, 126: 1, 127: 128, 254: 1,
        255: 256, 256: 256, 510: 2, 511: 512, 512: 512,
        1022: 2, 1023: 1024, 5000: 1024,
    }
    for banned, want in expect.items():
        assert _ban_threshold(banned) == want, (banned, want)


def test_parse_proxy_spec_with_userpwd():
    ps = parse_proxy_spec("10.0.0.1:8080 bob:secret, 10.0.0.2:3128")
    assert [(p.ip, p.port, p.userpwd) for p in ps] == [
        ("10.0.0.1", 8080, "bob:secret"),
        ("10.0.0.2", 3128, ""),
    ]


def test_one_proxy_per_site_until_banned():
    """numBanned=0 → threshold 1: a site sticks to one proxy (start
    slot = urlIp % n) no matter how loaded it gets; different sites
    spread across the pool (SpiderProxy.cpp:631-635 comment)."""
    a = ProxyAllocator("10.0.0.1:81 10.0.0.2:82 10.0.0.3:83")
    l1 = a.get_proxy(6, now_ms=1000)  # 6 % 3 = 0
    l2 = a.get_proxy(6, now_ms=1001)  # still in flight elsewhere
    assert l1.key() == l2.key() == ("10.0.0.1", 81)
    assert a.get_proxy(7, now_ms=1002).key() == ("10.0.0.2", 82)
    assert a.get_proxy(8, now_ms=1003).key() == ("10.0.0.3", 83)
    assert [p.num_outstanding for p in a.proxies] == [2, 1, 1]
    a.return_proxy(6, l1.key(), l1.lb_id, now_ms=1004)
    assert a.proxies[0].num_outstanding == 1


def test_ban_rollover_and_has_more():
    a = ProxyAllocator("10.0.0.1:81 10.0.0.2:82 10.0.0.3:83")
    l1 = a.get_proxy(3, now_ms=1000)  # 3 % 3 = 0 -> proxy 1
    assert l1.num_banned_proxies == 0 and l1.has_more_proxies_to_try
    # site banned proxy 1: rotate
    l2 = a.get_proxy(3, ban_proxy_key=l1.key(), ban_lb_id=l1.lb_id,
                     now_ms=2000)
    assert l2.key() != l1.key()
    assert l2.num_banned_proxies == 1
    assert a.ban_count[l1.key()] == 1
    # ban the second too
    l3 = a.get_proxy(3, ban_proxy_key=l2.key(), ban_lb_id=l2.lb_id,
                     now_ms=3000)
    assert l3.key() not in (l1.key(), l2.key())
    assert l3.num_banned_proxies == 2
    # only one alive remains -> no more to try
    assert not l3.has_more_proxies_to_try
    # ban the last: all banned -> skipDead=false pass still yields one
    l4 = a.get_proxy(3, ban_proxy_key=l3.key(), ban_lb_id=l3.lb_id,
                     now_ms=4000)
    assert l4.num_banned_proxies == 3
    assert not l4.has_more_proxies_to_try
    # the ban is per-site: another url-IP still gets threshold-1 service
    assert a.get_proxy(4, now_ms=5000).num_banned_proxies == 0


def test_longest_idle_tiebreak_and_bucket_expiry():
    a = ProxyAllocator("10.0.0.1:81 10.0.0.2:82 10.0.0.3:83")
    ip = 3  # start slot 0
    l1 = a.get_proxy(ip, now_ms=1000)
    # ban proxy 1 -> window opens to the next two (threshold 2)
    l2 = a.get_proxy(ip, ban_proxy_key=l1.key(), ban_lb_id=l1.lb_id,
                     now_ms=2000)
    assert l2.key() == ("10.0.0.2", 82)  # first candidate wins the 0-tie
    a.return_proxy(ip, l2.key(), l2.lb_id, now_ms=3000)
    # both idle now, but proxy 2 was used at t=3000 and proxy 3 never:
    # the longest-idle proxy wins the tie (SpiderProxy.cpp:710-716)
    l3 = a.get_proxy(ip, now_ms=4000)
    assert l3.key() == ("10.0.0.3", 83)
    a.return_proxy(ip, l3.key(), l3.lb_id, now_ms=4100)
    # completed buckets expire LOADPOINT_EXPIRE_MS after their end time
    assert len(a._buckets) == 3  # l1 (returned by the ban), l2, l3
    a.get_proxy(99, now_ms=4100 + LOADPOINT_EXPIRE_MS + 1000)
    assert [b.end_ms for b in a._buckets] == [0]  # only the fresh lease


# ---------------------------------------------------------------------------
# localhost fixture servers
# ---------------------------------------------------------------------------


class _Origin:
    """Plain-HTTP origin: 404 robots (allow-all), 200 page otherwise."""

    def __init__(self):
        self.hits = []
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
        self.hits.append((host, path))
        if path == "/robots.txt":
            writer.write(b"HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n")
        else:
            body = PAGE.encode()
            writer.write(
                (
                    f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode()
                + body
            )
        try:
            await writer.drain()
        except ConnectionError:
            pass
        writer.close()


from open_source_search_engine_ray.testing import ForwardProxy as _ForwardProxy


@pytest.fixture(scope="module")
def origin():
    srv = _Origin().start()
    yield srv
    srv.stop()


def _batch(urls, hosts, ips):
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "first_ip": pa.array(ips, pa.int64()),
            "launch_ms": pa.array([1000] * len(urls), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# e2e through real localhost proxies
# ---------------------------------------------------------------------------


def test_proxied_http_fetch_spreads_sites(origin):
    p1 = _ForwardProxy(origin.port).start()
    p2 = _ForwardProxy(origin.port).start()
    try:
        alloc = ProxyAllocator(f"127.0.0.1:{p1.port} 127.0.0.1:{p2.port}")
        st = HttpFetchStage(
            resolve={},  # never used: the proxy resolves
            proxy=alloc,
            force_use_proxies=True,
            connect_timeout_s=2.0,
            read_timeout_s=2.0,
        )
        out = st(
            _batch(
                ["http://a.test/x", "http://b.test/y"],
                ["a.test", "b.test"],
                [10, 11],  # 10%2=0 -> proxy 1; 11%2=1 -> proxy 2
            )
        )
        assert out["http_status"].to_pylist() == [200, 200]
        assert out["html"].to_pylist() == [PAGE, PAGE]
        # each site stuck to its start-slot proxy (robots + page)
        assert {h for (_, h, _) in p1.hits} == {"a.test"}
        assert {h for (_, h, _) in p2.hits} == {"b.test"}
        # origin saw origin-form requests with the right Host
        assert ("a.test", "/x") in origin.hits
        assert ("b.test", "/y") in origin.hits
        # leases were all returned
        assert all(p.num_outstanding == 0 for p in alloc.proxies)
    finally:
        p1.stop()
        p2.stop()


def test_proxied_ban_rotates_and_backs_off(origin):
    # proxy 1's IP is banned by ban.test: 403s everything but robots
    p1 = _ForwardProxy(origin.port, ban_hosts={"ban.test"}).start()
    p2 = _ForwardProxy(origin.port).start()
    try:
        alloc = ProxyAllocator(f"127.0.0.1:{p1.port} 127.0.0.1:{p2.port}")
        st = HttpFetchStage(
            resolve={},
            proxy=alloc,
            force_use_proxies=True,
            auto_backoff=False,  # isolate the proxy-rotation layer
            connect_timeout_s=2.0,
            read_timeout_s=2.0,
        )
        ip = 10  # start slot 0 -> proxy 1 first
        t0 = time.monotonic()
        out = st(_batch(["http://ban.test/page"], ["ban.test"], [ip]))
        # 403 through proxy 1 -> (urlIp, proxy1) banned -> retried
        # through proxy 2 -> 200 (gotHttpReply9 rotation)
        assert out["http_status"].to_pylist() == [200]
        assert out["html"].to_pylist() == [PAGE]
        assert ("GET", "ban.test", "/page") in p1.hits
        assert ("GET", "ban.test", "/page") in p2.hits
        assert alloc.ban_count[("127.0.0.1", p1.port)] == 1
        # second fetch: the lease reports 1 banned proxy -> self-imposed
        # crawl delay of DELAYPERBAN ms before launching
        out2 = st(_batch(["http://ban.test/again"], ["ban.test"], [ip]))
        wall = time.monotonic() - t0
        assert out2["http_status"].to_pylist() == [200]
        assert wall >= DELAYPERBAN_MS / 1000.0 * 0.8
        # the rotation never touched proxy 1 again for this site
        assert ("GET", "ban.test", "/again") in p2.hits
        assert ("GET", "ban.test", "/again") not in p1.hits
        assert all(p.num_outstanding == 0 for p in alloc.proxies)
    finally:
        p1.stop()
        p2.stop()


@pytest.fixture(scope="module")
def tls_origin(tmp_path_factory):
    """Self-signed HTTPS origin for the CONNECT test (cert for
    tls.test, SAN-matched)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    d = tmp_path_factory.mktemp("proxytls")
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

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(certfile), str(keyfile))

    class _TlsOrigin(_Origin):
        def _run(self):
            self.loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self.loop)
            srv = self.loop.run_until_complete(
                asyncio.start_server(self._handle, "127.0.0.1", 0, ssl=ctx)
            )
            self.port = srv.sockets[0].getsockname()[1]
            self._ready.set()
            self.loop.run_forever()

    srv = _TlsOrigin().start()
    srv.certfile = str(certfile)
    yield srv
    srv.stop()


def test_proxied_https_connect_tunnel(origin, tls_origin):
    p1 = _ForwardProxy(origin.port, tls_origin_port=tls_origin.port).start()
    try:
        st = HttpFetchStage(
            resolve={},
            proxy=ProxyAllocator(f"127.0.0.1:{p1.port}"),
            force_use_proxies=True,
            ssl_context=ssl.create_default_context(cafile=tls_origin.certfile),
            connect_timeout_s=3.0,
            read_timeout_s=3.0,
        )
        out = st(_batch(["https://tls.test/sec"], ["tls.test"], [5]))
        assert out["http_status"].to_pylist() == [200]
        assert out["html"].to_pylist() == [PAGE]
        # both the robots fetch and the page ran CONNECT tunnels
        assert [m for (m, h, _) in p1.hits if h == "tls.test"] == [
            "CONNECT",
            "CONNECT",
        ]
        assert ("tls.test", "/sec") in tls_origin.hits
    finally:
        p1.stop()


def test_proxy_auth_header_sent(origin):
    p1 = _ForwardProxy(origin.port).start()
    try:
        st = HttpFetchStage(
            resolve={},
            proxy=ProxyAllocator(f"127.0.0.1:{p1.port} bob:secret"),
            force_use_proxies=True,
            connect_timeout_s=2.0,
            read_timeout_s=2.0,
        )
        out = st(_batch(["http://a.test/x"], ["a.test"], [1]))
        assert out["http_status"].to_pylist() == [200]
        import base64

        want = "Basic " + base64.b64encode(b"bob:secret").decode()
        assert p1.auths and all(a == want for a in p1.auths)
    finally:
        p1.stop()


def test_broker_actor_pool(origin, ray_session):
    """The cluster form: one ProxyBroker actor shared by a map_batches
    actor pool — central load/ban state, tiny RPC per download."""
    import ray
    import ray.data as rd

    p1 = _ForwardProxy(origin.port).start()
    p2 = _ForwardProxy(origin.port).start()
    try:
        broker = make_proxy_broker(f"127.0.0.1:{p1.port} 127.0.0.1:{p2.port}")
        rows = [
            {
                "url": f"http://site{i}.test/p",
                "host": f"site{i}.test",
                "first_ip": 100 + i,
                "launch_ms": 1000,
            }
            for i in range(6)
        ]
        out = (
            rd.from_items(rows)
            .map_batches(
                HttpFetchStage,
                fn_constructor_kwargs={
                    "resolve": {},
                    "proxy": broker,
                    "force_use_proxies": True,
                    "connect_timeout_s": 2.0,
                    "read_timeout_s": 2.0,
                },
                concurrency=2,
                batch_size=3,
                batch_format="pyarrow",
                num_cpus=0.5,
            )
            .to_pandas()
        )
        assert len(out) == 6
        assert (out["http_status"] == 200).all()
        stats = ray.get(broker.stats.remote())
        # every download was brokered; both proxies participated
        assert sum(s["requests"] for s in stats) >= 12  # robots + page x6
        assert all(s["requests"] > 0 for s in stats)
    finally:
        p1.stop()
        p2.stop()


def test_http_crawl_through_proxy_broker(ray_session, tmp_path):
    """run_http_crawl with a spec-string ``proxy`` builds ONE shared
    ProxyBroker actor and every fetch actor routes through it — the
    e2e form of the reference's host-#0 msg-0x54 flow."""
    import pyarrow.dataset as pads

    from open_source_search_engine_ray.functions.urlfilter import UrlFilterRule
    from open_source_search_engine_ray.pipelines.httpcrawl import run_http_crawl
    from open_source_search_engine_ray.testing import StaticSiteServer

    sites = {
        "p1.test": {
            "/": '<html><body><a href="/a.html">a</a>'
            '<a href="http://p2.test/">x</a>seed</body></html>',
            "/a.html": "<html><body>alpha</body></html>",
        },
        "p2.test": {
            "/": '<html><body><a href="/b.html">b</a>beta</body></html>',
            "/b.html": "<html><body>leaf</body></html>",
        },
    }
    srv = StaticSiteServer(sites).start()
    proxy = _ForwardProxy(srv.port).start()
    try:
        from open_source_search_engine_ray.state.frontier import CrawlConfig

        res = run_http_crawl(
            seeds=["http://p1.test/"],
            resolve=srv.resolve_map(),
            out_dir=str(tmp_path / "out"),
            cfg=CrawlConfig(
                num_partitions=2,
                horizon_ms=60_000,
                rules=(UrlFilterRule("default", 50, 30.0, 9, 7, 50),),
            ),
            n_fetchers=2,
            fetcher_kwargs={
                "proxy": f"127.0.0.1:{proxy.port}",
                "force_use_proxies": True,
                "connect_timeout_s": 2.0,
                "read_timeout_s": 2.0,
            },
        )
        docs = pads.dataset(res["docs_dir"], format="parquet").to_table()
        got = set(docs["doc_id"].to_pylist())
        assert got == {
            "http://p1.test/",
            "http://p1.test/a.html",
            "http://p2.test/",
            "http://p2.test/b.html",
        }
        # every page download went THROUGH the proxy (origin-form GETs
        # relayed by the forward proxy), none straight to the origin
        proxied_gets = {(h, p) for (m, h, p) in proxy.hits if m == "GET"}
        for host, path in (
            ("p1.test", "/"),
            ("p1.test", "/a.html"),
            ("p2.test", "/"),
            ("p2.test", "/b.html"),
        ):
            assert (host, path) in proxied_gets
        origin_hits = len([1 for (_, h, p) in srv.hits])
        proxy_hits = len(proxy.hits)
        assert origin_hits == proxy_hits  # nothing bypassed the proxy
    finally:
        proxy.stop()
        srv.stop()
