"""Real-socket fetch tier against a localhost fixture server (the
reference's test/system ``httpserver`` pattern, test/Makefile).

Covers: the tmp-error taxonomy feeding ``hastmperror``
(Spider.cpp:2333-2344), wall-clock politeness gaps from robots
Crawl-delay via the hammer queue (Msg13.cpp:1998-2137), twitchy-IP
backoff with the retry-once rule (Msg13.cpp:416-436, 1178-1206), gzip /
chunked / deflate response handling, and the end-to-end
``errorcount>=1 && hastmperror`` reschedule rule on the produced reply.
"""

import asyncio
import gzip
import socket
import struct
import threading
import time

import numpy as np
import pyarrow as pa

from open_source_search_engine_ray.functions.urlfilter import (
    ERR_CONN_RESET,
    ERR_DNS,
    ERR_NET_UNREACH,
    ERR_ROBOTS_DENIED,
    ERR_TCP_TIMEOUT,
    TMP_ERROR_CODES,
    FilterProgram,
    candidate_columns,
    default_web_rules,
)
from open_source_search_engine_ray.stages.httpfetch import HttpFetchStage

WEB = FilterProgram(default_web_rules())


def rule_of(**kw):
    c = candidate_columns(1)
    c["url"][0] = "http://www.x.test/"
    c["tld"][0] = "test"
    c["lang"][0] = "en"
    c["in_sitelist"][0] = True
    for k, v in kw.items():
        c[k][0] = v
    return int(WEB.assign(c)[0])


def expr(i):
    return WEB.rules[i].expression

ROBOTS = {
    "cd.test": "User-agent: *\nCrawl-delay: 0.4\nDisallow: /private\n",
    "deny.test": "User-agent: gigablastbot\nDisallow: /\n",
}

PAGE = "<html><head><title>T</title></head><body>hello fixture</body></html>"


class _Server:
    """Threaded asyncio HTTP/1.1 fixture server; routes on Host+path."""

    def __init__(self):
        self.hits = []  # (monotonic_s, host, path)
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
            asyncio.start_server(self._handle, "127.0.0.1", 0)
        )
        self.port = srv.sockets[0].getsockname()[1]
        self._ready.set()
        self.loop.run_forever()

    @staticmethod
    def _resp(status, body=b"", headers=()):
        reason = {200: "OK", 403: "Forbidden", 404: "Not Found"}[status]
        head = f"HTTP/1.1 {status} {reason}\r\n"
        hs = list(headers) + [f"Content-Length: {len(body)}"]
        return (head + "\r\n".join(hs) + "\r\n\r\n").encode() + body

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
        key = (host, path)
        self.counts[key] = self.counts.get(key, 0) + 1

        if path == "/robots.txt":
            txt = ROBOTS.get(host)
            if txt is None:
                writer.write(self._resp(404))
            else:
                writer.write(
                    self._resp(200, txt.encode(), ["Content-Type: text/plain"])
                )
        elif host == "slow.test":
            await asyncio.sleep(2.0)
            writer.write(self._resp(200, PAGE.encode()))
        elif host == "reset.test":
            # SO_LINGER 0 + close → RST → ECONNRESET on the client
            sock = writer.get_extra_info("socket")
            sock.setsockopt(
                socket.SOL_SOCKET, socket.SO_LINGER, struct.pack("ii", 1, 0)
            )
            writer.close()
            return
        elif host == "ban.test" and path == "/page":
            if self.counts[key] == 1:
                writer.write(self._resp(403))
            else:
                writer.write(self._resp(200, PAGE.encode()))
        elif path == "/gzip":
            gz = gzip.compress(PAGE.encode())
            writer.write(
                self._resp(
                    200,
                    gz,
                    ["Content-Type: text/html", "Content-Encoding: gzip"],
                )
            )
        elif path == "/lastmod":
            writer.write(
                self._resp(
                    200,
                    PAGE.encode(),
                    [
                        "Content-Type: text/html",
                        "Last-Modified: Sun, 06 Nov 1994 08:49:37 GMT",
                    ],
                )
            )
        elif path == "/chunked":
            body = PAGE.encode()
            mid = len(body) // 2
            chunks = b"".join(
                b"%x\r\n%s\r\n" % (len(c), c) for c in (body[:mid], body[mid:])
            )
            chunks += b"0\r\n\r\n"
            writer.write(
                (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Transfer-Encoding: chunked\r\n\r\n"
                )
                + chunks
            )
        else:
            writer.write(self._resp(200, PAGE.encode()))
        try:
            await writer.drain()
        except ConnectionError:
            pass
        writer.close()


def _batch(urls, hosts, ips):
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "first_ip": pa.array(ips, pa.int64()),
            "launch_ms": pa.array([1000] * len(urls), pa.int64()),
        }
    )


def _stage(server, extra_hosts=(), **kw):
    resolve = {
        h: ("127.0.0.1", server.port)
        for h in (
            "plain.test",
            "cd.test",
            "deny.test",
            "slow.test",
            "reset.test",
            "ban.test",
        )
    }
    resolve.update(extra_hosts)
    kw.setdefault("connect_timeout_s", 2.0)
    kw.setdefault("read_timeout_s", 0.5)
    return HttpFetchStage(resolve=resolve, **kw)


def setup_module(module):
    module.SRV = _Server().start()


def teardown_module(module):
    module.SRV.stop()


def test_basic_gzip_chunked_and_robots_deny():
    st = _stage(SRV)
    out = st(
        _batch(
            [
                "http://plain.test/a",
                "http://plain.test/gzip",
                "http://plain.test/chunked",
                "http://deny.test/x",
                "http://cd.test/private/p",
            ],
            ["plain.test"] * 3 + ["deny.test", "cd.test"],
            [1, 1, 1, 2, 3],
        )
    )
    status = out["http_status"].to_pylist()
    err = out["err_code"].to_pylist()
    html = out["html"].to_pylist()
    allowed = out["robots_allowed"].to_pylist()
    assert status[:3] == [200, 200, 200]
    # gzip and chunked bodies round-trip identically to the plain body
    assert html[0] == html[1] == html[2] == PAGE
    # robots Disallow → denied, no download of the page itself
    assert err[3] == ERR_ROBOTS_DENIED and not allowed[3]
    assert err[4] == ERR_ROBOTS_DENIED and not allowed[4]
    assert ("deny.test", "/x") not in SRV.counts
    # crawl-delay surfaced on the cd.test row, none on plain.test
    cds = out["crawl_delay_ms"].to_pylist()
    assert cds[0] == -1 and cds[4] == 400


def test_politeness_gap_on_wall_clock():
    st = _stage(SRV)
    t0 = time.monotonic()
    out = st(
        _batch(
            ["http://cd.test/p1", "http://cd.test/p2"],
            ["cd.test", "cd.test"],
            [7, 7],
        )
    )
    wall = time.monotonic() - t0
    assert out["http_status"].to_pylist() == [200, 200]
    starts = sorted(
        t for (t, h, p) in SRV.hits if h == "cd.test" and p.startswith("/p")
    )
    assert len(starts) == 2
    # hammer queue spaced the two downloads by >= the 400 ms crawl-delay
    assert starts[1] - starts[0] >= 0.35
    assert wall >= 0.35


def test_tmp_error_taxonomy():
    # a host absent from the resolver = DNS failure; a closed port =
    # refused; slow.test exceeds the read timeout; reset.test RSTs.
    st = _stage(SRV, extra_hosts={"refused.test": ("127.0.0.1", 1)})
    out = st(
        _batch(
            [
                "http://nodns.test/a",
                "http://refused.test/a",
                "http://slow.test/a",
                "http://reset.test/a",
            ],
            ["nodns.test", "refused.test", "slow.test", "reset.test"],
            [11, 12, 13, 14],
        )
    )
    err = out["err_code"].to_pylist()
    assert err[0] == ERR_DNS
    assert err[1] == ERR_NET_UNREACH
    assert err[2] == ERR_TCP_TIMEOUT
    assert err[3] == ERR_CONN_RESET
    # the first three are tmp errors (Spider.cpp:2333-2344); a conn
    # reset is a ban signal, NOT a tmp error
    assert all(e in TMP_ERROR_CODES for e in err[:3])
    assert ERR_CONN_RESET not in TMP_ERROR_CODES
    # reset IP went twitchy (and burned its one retry)
    assert 14 in st._twitchy


def test_twitchy_backoff_retries_once():
    st = _stage(SRV, auto_crawl_delay_ms=200)
    out = st(_batch(["http://ban.test/page"], ["ban.test"], [21]))
    # 403 → banned → IP marked twitchy → single retry succeeds
    assert out["http_status"].to_pylist() == [200]
    assert 21 in st._twitchy
    assert SRV.counts[("ban.test", "/page")] == 2
    hits = sorted(t for (t, h, p) in SRV.hits if h == "ban.test" and p == "/page")
    # the retry honored the AUTOCRAWLDELAY backoff (Msg13.cpp:2030-2041)
    assert hits[1] - hits[0] >= 0.15
    # a second banned URL on an already-twitchy IP is NOT retried
    out2 = st(_batch(["http://reset.test/b"], ["reset.test"], [21]))
    assert out2["err_code"].to_pylist() == [ERR_CONN_RESET]
    assert SRV.counts[("reset.test", "/b")] == 1  # one attempt, no retry


def test_tmp_error_feeds_reschedule_rule():
    st = _stage(SRV)
    out = st(_batch(["http://slow.test/r"], ["slow.test"], [31]))
    code = out["err_code"].to_pylist()[0]
    assert code in TMP_ERROR_CODES
    # reply with that code + errorcount 1 → the priority-45 retry rule
    i = rule_of(had_reply=True, err_count=1, err_code=code, spidered_time=10)
    assert expr(i) == "errorcount>=1 && hastmperror"
    assert not WEB.force_delete[i]
    # a conn reset is permanent-style: falls to the errorcount>=1 delete
    j = rule_of(
        had_reply=True, err_count=1, err_code=ERR_CONN_RESET, spidered_time=10
    )
    assert expr(j) == "errorcount>=1"
    assert WEB.force_delete[j]


def test_map_batches_actor_pool_contract(ray_session):
    """The stage is a drop-in actor-pool map_batches callable: event
    loop + caches live per actor, batches flow as Arrow tables."""
    import ray.data as rd

    resolve = {h: ("127.0.0.1", SRV.port) for h in ("plain.test", "cd.test")}
    rows = [
        {
            "url": f"http://plain.test/mb{i}",
            "host": "plain.test",
            "first_ip": 900 + (i % 2),
            "launch_ms": 1000,
        }
        for i in range(8)
    ]
    out = (
        rd.from_items(rows)
        .map_batches(
            HttpFetchStage,
            fn_constructor_kwargs={
                "resolve": resolve,
                "connect_timeout_s": 2.0,
                "read_timeout_s": 2.0,
            },
            concurrency=2,
            batch_size=4,
            batch_format="pyarrow",
            num_cpus=0.5,
        )
        .to_pandas()
    )
    assert len(out) == 8
    assert (out["http_status"] == 200).all()
    assert out["html"].str.contains("hello fixture").all()


def test_malformed_deflate_yields_error_reply():
    """A body declaring Content-Encoding: deflate that inflates with
    neither zlib wrapper nor raw-deflate must produce an ERR_HTTP_500
    error reply row, not raise through the fetch batch (Ray task
    retries would re-fail identically)."""
    from open_source_search_engine_ray.functions import urlfilter
    from open_source_search_engine_ray.stages.httpfetch import _parse_response

    raw = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: deflate\r\n\r\n\x00not-deflate\xff\xfe"
    )
    fr = _parse_response(raw)
    assert fr.err_code == urlfilter.ERR_HTTP_500

    # sanity: both accepted deflate framings still inflate
    import zlib

    payload = b"<html>ok</html>"
    for body in (
        zlib.compress(payload),
        zlib.compress(payload)[2:-4],  # raw deflate (no zlib wrapper)
    ):
        fr = _parse_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + body
        )
        assert fr.err_code == 0 and fr.body == payload


def test_last_modified_and_content_length_parse():
    """The MIME tier extracts Last-Modified (HttpMime.cpp
    m_lastModifiedDate via atotime) and Content-Length; absent headers
    stay -1."""
    st = _stage(SRV)
    out = st(
        _batch(
            ["http://plain.test/lastmod", "http://plain.test/a"],
            ["plain.test"] * 2,
            [1, 1],
        )
    )
    lm = out["last_modified"].to_pylist()
    assert lm[0] == 784111777  # Sun, 06 Nov 1994 08:49:37 GMT
    assert lm[1] == -1

    from open_source_search_engine_ray.stages.httpfetch import _parse_response

    fr = _parse_response(
        b"HTTP/1.1 200 OK\r\nContent-Length: 5\r\n"
        b"Last-Modified: Sunday, 06-Nov-94 08:49:37 GMT\r\n\r\nhello"
    )
    assert fr.last_modified == 784111777 and fr.content_length == 5
    fr = _parse_response(b"HTTP/1.1 200 OK\r\nContent-Length: zzz\r\n\r\nx")
    assert fr.content_length == -1
