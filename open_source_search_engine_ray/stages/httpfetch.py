"""HttpFetchStage: the real-socket fetch tier (stdlib asyncio).

Drop-in replacement for :class:`stages.fetch.FetchStage` with the same
batch contract — input rows carry ``url / host / first_ip / launch_ms``,
output appends the ``FETCH_OUT_FIELDS`` columns — but the download is a
real HTTP GET over a TCP socket instead of the procedural SynthWeb.

Reference semantics implemented here:

* **Download path** — Msg13::getDoc (Msg13.cpp:125-765): robots.txt is
  fetched first (cached per host, 24 h TTL, Msg13.cpp:477-494; robots
  fetches skip the hammer check, ``m_skipHammerCheck``), then the body.
* **Tmp-error taxonomy** — Spider.cpp:2333-2344: DNS failures map to
  ``ERR_DNS`` (EDNSTIMEDOUT/EDNSDEAD), connect/read timeouts to
  ``ERR_TCP_TIMEOUT`` (ETCPTIMEDOUT), refused/unreachable to
  ``ERR_NET_UNREACH`` (ENETUNREACH/EHOSTUNREACH) — all members of
  ``urlfilter.TMP_ERROR_CODES`` so the ``hastmperror`` predicate and the
  ``errorcount>=1 && hastmperror`` reschedule rules fire.  Connection
  resets map to ``ERR_CONN_RESET`` which is NOT a tmp error: the
  reference feeds it to the ban heuristic instead (ipWasBanned,
  Msg13.cpp:966-977).
* **Hammer queue** — addToHammerQueue / scanHammerQueue
  (Msg13.cpp:1998-2137): one download per first-IP at a time when a
  crawl-delay is set; a queued request is re-evaluated every 10 ms
  (HAMMER_SCAN_MS) until ``now - lastDownloadStart >= crawlDelayMS``.
  The per-IP timestamp stores the download START time (0 while a
  download is in flight; the end time instead when
  ``crawl_delay_from_end`` is set — Msg13.cpp:1216-1227).
* **Twitchy-IP backoff** — Msg13.cpp:416-436 + 1178-1206: a banned
  reply (conn reset, empty reply, HTTP 403/999/503 — ipWasBanned,
  Msg13.cpp:955-1018, never for robots.txt) adds the IP to the twitchy
  table; the download is retried ONCE if the IP was not already twitchy
  when it started (``m_wasInTableBeforeStarting``); requests to twitchy
  IPs run with ``crawlDelayMS >= AUTOCRAWLDELAY`` (5000 ms,
  Msg13.cpp:1995 + 2030-2041).

The stage is a callable class for ``map_batches(Cls, concurrency=N)``:
the event loop, robots cache, hammer clocks, and twitchy table live per
actor.  At 100 TB the per-IP politeness state is correct because the
frontier already partitions requests by first-IP (part_of_ip), so all
URLs of an IP land on the same fetch batch stream.

Gzip ``Content-Encoding`` is decompressed here (reference inflates in
gotHttpReply2, Msg13.cpp:1920-2004); bodies are decoded to UTF-8 via the
charset sniffing chain (functions/charset.py).
"""

from __future__ import annotations

import asyncio
import gzip
import ssl as _ssl_module
import time
import zlib

import numpy as np
import pyarrow as pa

from ..functions import urlfilter
from ..functions.charset import to_utf8
from ..functions.httpdate import parse_http_date
from ..functions.robots import parse_robots
from ..functions.urlnorm import get_path_with_query

HAMMER_SCAN_MS = 10  # scanHammerQueue re-scan cadence (Msg13.cpp:2137)
AUTOCRAWLDELAY_MS = 5000  # Msg13.cpp:1995 (crawldelay once IP is twitchy)
ROBOTS_TTL_S = 24 * 3600  # Msg13.cpp:477-494
BAN_STATUSES = frozenset({403, 999, 503})  # ipWasBanned, Msg13.cpp:993-1007
DELAYPERBAN_MS = 500  # Msg13.cpp:1991: self-imposed delay per banned proxy

_CRLF = b"\r\n"


class _FetchResult:
    __slots__ = (
        "http_status",
        "err_code",
        "body",
        "content_type",
        "location",
        "banned",
        "reset",
        "last_modified",
        "content_length",
    )

    def __init__(self):
        self.http_status = 0
        self.err_code = urlfilter.ERR_NONE
        self.body = b""
        self.content_type = ""
        self.location = ""
        self.banned = False
        self.reset = False
        self.last_modified = -1  # epoch sec (HttpMime m_lastModifiedDate)
        self.content_length = -1  # declared bytes (HttpMime m_contentLen)


def _split_host(url: str) -> tuple:
    """(host, port, path_with_query, is_https) from an http(s) URL.
    Default port 443 for https (reference HttpServer.h:138-143 m_ssltcp
    listens on the ssl port; Msg13.cpp:2376-2380 routes https URLs)."""
    scheme, _, rest = url.partition("://")
    https = scheme == "https"
    slash = rest.find("/")
    hostport = rest if slash < 0 else rest[:slash]
    path = "/" if slash < 0 else rest[slash:]
    if ":" in hostport and not hostport.startswith("["):
        host, _, port = hostport.rpartition(":")
        return host, int(port), path, https
    return hostport, 443 if https else 80, path, https


def _parse_response(raw: bytes) -> _FetchResult:
    fr = _FetchResult()
    head, sep, body = raw.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = raw.partition(b"\n\n")
    lines = head.split(b"\n")
    status_line = lines[0].strip()
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        fr.err_code = urlfilter.ERR_HTTP_500
        return fr
    try:
        fr.http_status = int(parts[1])
    except ValueError:
        fr.err_code = urlfilter.ERR_HTTP_500
        return fr
    headers = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        headers[k.strip().lower()] = v.strip()
    fr.content_type = headers.get(b"content-type", b"").decode("latin-1")
    fr.location = headers.get(b"location", b"").decode("latin-1")
    fr.last_modified = parse_http_date(headers.get(b"last-modified"))
    try:
        fr.content_length = int(headers.get(b"content-length", b"-1"))
    except ValueError:
        fr.content_length = -1
    if headers.get(b"transfer-encoding", b"").lower() == b"chunked":
        body = _dechunk(body)
    enc = headers.get(b"content-encoding", b"").lower()
    if enc == b"gzip":
        try:
            body = gzip.decompress(body)
        except OSError:
            fr.err_code = urlfilter.ERR_HTTP_500
            return fr
    elif enc == b"deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except zlib.error:
                fr.err_code = urlfilter.ERR_HTTP_500
                return fr
    fr.body = body
    return fr


def _dechunk(body: bytes) -> bytes:
    out = []
    pos = 0
    while pos < len(body):
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            break
        try:
            size = int(body[pos:nl].split(b";")[0], 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[nl + 2 : nl + 2 + size])
        pos = nl + 2 + size + 2
    return b"".join(out)


class HttpFetchStage:
    """Async real-socket fetch over a batch of launch rows.

    ``resolve`` maps host -> (address, port) — the static DNS seam for
    tests: it points every synthetic host at the localhost fixture
    server (the reference's test/system httpserver pattern).  In
    production ``resolve`` is None and lookups go through ``dns``, an
    async caching :class:`~..stages.dnscache.DnsCache` (LRU + negative +
    timed-out caching per Dns.cpp; default-constructed when not given),
    whose failures surface as ``ERR_DNS`` — a tmp error, so the
    ``errorcount>=1 && hastmperror`` reschedule rule fires.

    ``ssl_context`` drives https fetches (SNI = the URL host even when
    connecting to a resolved address); None lazily becomes
    ``ssl.create_default_context()``.  TLS handshake/cert failures map
    to ``ERR_TLS`` (permanent — reference ESSLERROR, Errno.h:152).

    **Spider proxies** (SpiderProxy.cpp + Msg13.cpp:615-660,1040-1090):
    ``proxy`` is a :class:`~..state.proxy.ProxyAllocator`, a
    ``make_proxy_broker`` Ray actor handle (the host-#0 form), or a
    config spec string.  ``force_use_proxies`` routes every download
    through a proxy (m_forceUseFloaters); ``auto_use_proxies`` routes
    only twitchy IPs (cr->m_automaticallyUseProxies +
    isIpInTwitchyTable, Msg13.cpp:630-636).  A proxied download that
    comes back looking IP-banned (conn reset / empty reply / HTTP
    403/999/503 — never for robots.txt) bans the (urlIp, proxy) pair at
    the allocator and retries through the next proxy while
    ``has_more_proxies_to_try`` (gotHttpReply9, Msg13.cpp:1040-1090);
    the reply's ``num_banned_proxies`` raises the self-imposed crawl
    delay to ``num_banned * DELAYPERBAN`` ms (Msg13.cpp:2046-2052).
    HTTP goes through the proxy as an absolute-URI GET with
    ``Proxy-Authorization``; HTTPS tunnels via CONNECT then upgrades
    the stream with start_tls.
    """

    def __init__(
        self,
        user_agent: str = "gigablastbot",
        resolve: dict | None = None,
        dns=None,
        ssl_context=None,
        connect_timeout_s: float = 5.0,
        read_timeout_s: float = 10.0,
        max_connections: int = 32,
        auto_backoff: bool = True,
        crawl_delay_from_end: bool = False,
        auto_crawl_delay_ms: int = AUTOCRAWLDELAY_MS,
        proxy=None,
        force_use_proxies: bool = False,
        auto_use_proxies: bool = False,
        use_if_modified_since: bool = False,
        ca_file: str | None = None,
    ):
        self.ua = user_agent
        self.resolve = resolve
        self.dns = dns
        # ssl.SSLContext is NOT picklable, so fetch actors on other
        # nodes can't receive one via fetcher_kwargs; ``ca_file`` is the
        # picklable form — the context is built lazily per actor
        self.ca_file = ca_file
        self.ssl_context = ssl_context
        self.connect_timeout_s = connect_timeout_s
        self.read_timeout_s = read_timeout_s
        self.auto_backoff = auto_backoff
        self.crawl_delay_from_end = crawl_delay_from_end
        self.auto_crawl_delay_ms = auto_crawl_delay_ms
        # the stage owns its event loop in a dedicated thread: Ray actor
        # workers keep a running loop on the main thread, so
        # run_until_complete there raises "another loop is running"
        self._loop = None
        self._loop_thread = None
        self._sem = None  # created lazily inside the loop
        self._max_connections = max_connections
        # host -> (expiry_monotonic, RobotsPolicy)
        self._robots_cache: dict = {}
        # first_ip -> last download start ms (monotonic); 0 = in flight;
        # absent = never downloaded (reference RdbCache miss = -1)
        self._last_dl: dict = {}
        self._twitchy: set = set()
        self.fetch_count = 0  # downloads issued (incl. retries), tests
        if isinstance(proxy, (str, list, tuple)):
            from ..state.proxy import ProxyAllocator

            proxy = ProxyAllocator(proxy)
        self.proxy = proxy
        # a Ray actor handle exposes .get_proxy.remote; a local
        # allocator exposes .get_proxy directly
        self._proxy_is_actor = proxy is not None and hasattr(
            getattr(proxy, "get_proxy", None), "remote"
        )
        self.force_use_proxies = force_use_proxies and proxy is not None
        # the "use ifModifiedSince" collection parm (Parms.cpp:8742-8749)
        # — OFF by default, matching the reference's own hard-disable
        # (HttpRequest.cpp:222-223 ims=""); the content-hash unchanged
        # detection (Msg13.cpp:1434-1446) is active regardless, in the
        # crawl pipeline's reply builder
        self.use_if_modified_since = use_if_modified_since
        self.auto_use_proxies = auto_use_proxies and proxy is not None

    # -- low-level download -------------------------------------------

    async def _download(self, url: str, lease=None, ims: int = 0) -> _FetchResult:
        fr = _FetchResult()
        host, port, path, https = _split_host(url)
        proxy_auth = ""
        if lease is not None:
            # the proxy resolves the origin; we connect to the proxy
            addr, aport = lease.ip, lease.port
            if lease.userpwd:
                import base64

                proxy_auth = "Proxy-Authorization: Basic " + base64.b64encode(
                    lease.userpwd.encode("latin-1")
                ).decode("ascii") + "\r\n"
        elif self.resolve is not None:
            target = self.resolve.get(host)
            if target is None:
                fr.err_code = urlfilter.ERR_DNS
                return fr
            addr, aport = target
        else:
            if self.dns is None:
                from .dnscache import DnsCache

                self.dns = DnsCache()
            addr, errc = await self.dns.resolve(host)
            if addr is None:
                fr.err_code = errc
                return fr
            aport = port
        self.fetch_count += 1
        default = 443 if https else 80
        hostport = host if port == default else f"{host}:{port}"
        ssl_kw = {}
        if https and lease is None:
            if self.ssl_context is None:
                import ssl as _ssl

                self.ssl_context = _ssl.create_default_context(
                    cafile=self.ca_file
                )
            # SNI/verify against the URL host, not the resolved address
            ssl_kw = {"ssl": self.ssl_context, "server_hostname": host}
        reader = writer = None
        try:
            reader, writer = await asyncio.wait_for(
                asyncio.open_connection(addr, aport, **ssl_kw),
                self.connect_timeout_s,
            )
            if lease is not None and https:
                # CONNECT tunnel then TLS upgrade in place
                connect = (
                    f"CONNECT {host}:{port} HTTP/1.1\r\n"
                    f"Host: {host}:{port}\r\n{proxy_auth}\r\n"
                )
                writer.write(connect.encode("latin-1"))
                await writer.drain()
                head = await asyncio.wait_for(
                    reader.readuntil(b"\r\n\r\n"), self.connect_timeout_s
                )
                if b" 200" not in head.split(b"\r\n", 1)[0]:
                    fr.err_code = urlfilter.ERR_NET_UNREACH
                    return fr
                if self.ssl_context is None:
                    import ssl as _ssl

                    self.ssl_context = _ssl.create_default_context(
                        cafile=self.ca_file
                    )
                await writer.start_tls(
                    self.ssl_context, server_hostname=host
                )
            if lease is not None and not https:
                # plain HTTP through a proxy = absolute-URI request
                target_line = f"GET http://{hostport}{path} HTTP/1.1\r\n"
            else:
                target_line = f"GET {path} HTTP/1.1\r\n"
            # the reference's If-Modified-Since line: asctime + " UTC"
            # with the \n spliced to \r\n (HttpRequest.cpp:206-219)
            ims_hdr = (
                f"If-Modified-Since: {time.asctime(time.gmtime(ims))} UTC\r\n"
                if ims > 0
                else ""
            )
            req = (
                f"{target_line}Host: {hostport}\r\n"
                f"{proxy_auth if not https else ''}"
                f"User-Agent: {self.ua}\r\n{ims_hdr}Accept-Encoding: gzip\r\n"
                f"Connection: close\r\n\r\n"
            )
            writer.write(req.encode("latin-1"))
            await writer.drain()
            raw = await asyncio.wait_for(reader.read(-1), self.read_timeout_s)
        except asyncio.TimeoutError:
            fr.err_code = urlfilter.ERR_TCP_TIMEOUT
            return fr
        except asyncio.IncompleteReadError:
            # proxy hung up mid-CONNECT: empty-reply ban heuristic
            fr.err_code = urlfilter.ERR_HTTP_500
            fr.banned = True
            return fr
        except _ssl_module.SSLError:
            # handshake / cert failure — permanent (ESSLERROR); before
            # ConnectionResetError/OSError since SSLError is an OSError
            fr.err_code = urlfilter.ERR_TLS
            return fr
        except ConnectionResetError:
            # ban signal, not a tmp error (ipWasBanned, Msg13.cpp:966)
            fr.err_code = urlfilter.ERR_CONN_RESET
            fr.reset = True
            fr.banned = True
            return fr
        except (ConnectionRefusedError, OSError):
            fr.err_code = urlfilter.ERR_NET_UNREACH
            return fr
        finally:
            if writer is not None:
                writer.close()
        if not raw:
            # empty reply == closed socket on us (Msg13.cpp:985-989)
            fr.err_code = urlfilter.ERR_HTTP_500
            fr.banned = True
            return fr
        parsed = _parse_response(raw)
        if parsed.http_status in BAN_STATUSES or parsed.reset:
            parsed.banned = True
        return parsed

    # -- spider proxies ---------------------------------------------------

    async def _proxy_get(self, url_ip: int, ban_lease=None):
        """msg 0x54 round trip (handleRequest54): passing ``ban_lease``
        both returns it and bans the (urlIp, proxy) pair first."""
        ban_key = ban_lease.key() if ban_lease is not None else None
        ban_lb = ban_lease.lb_id if ban_lease is not None else None
        if self._proxy_is_actor:
            import ray

            ref = self.proxy.get_proxy.remote(url_ip, ban_key, ban_lb)
            loop = asyncio.get_running_loop()
            tup = await loop.run_in_executor(None, ray.get, ref)
            from ..state.proxy import ProxyLease

            return ProxyLease(*tup)
        return self.proxy.get_proxy(url_ip, ban_key, ban_lb)

    async def _proxy_return(self, url_ip: int, lease) -> None:
        """msg 0x55 (OP_RETPROXY) — fire-and-forget, like the
        reference's reply-less return when banning."""
        if self._proxy_is_actor:
            self.proxy.return_proxy.remote(url_ip, lease.key(), lease.lb_id)
            return
        self.proxy.return_proxy(url_ip, lease.key(), lease.lb_id)

    def _proxy_health(self, lease, err_code: int) -> None:
        """Feed download outcome into the proxy's m_lastDownloadError
        (the reference learns it from test-url downloads; we use the
        real ones). Only transport-level failures indict the PROXY —
        ban statuses indict the target site and go to the ban table."""
        bad = err_code in (
            urlfilter.ERR_TCP_TIMEOUT,
            urlfilter.ERR_NET_UNREACH,
            urlfilter.ERR_DNS,
        )
        if self._proxy_is_actor:
            if bad:
                self.proxy.mark_error.remote(lease.key(), err_code)
            else:
                self.proxy.mark_ok.remote(lease.key())
        elif bad:
            self.proxy.mark_error(lease.key(), err_code)
        else:
            self.proxy.mark_ok(lease.key())

    async def _proxied_fetch(self, url: str, url_ip: int, lease,
                             rotate: bool = True, ims: int = 0) -> _FetchResult:
        """gotHttpReply9 (Msg13.cpp:1040-1090): on a banned-looking
        reply, ban this proxy for this url-IP and retry through the
        next while the broker says more remain; robots.txt fetches set
        ``rotate=False`` (ipWasBanned skips robots, Msg13.cpp:962)."""
        while True:
            fr = await self._download(url, lease=lease, ims=ims)
            self._proxy_health(lease, fr.err_code)
            if rotate and fr.banned and lease.has_more_proxies_to_try:
                lease = await self._proxy_get(url_ip, ban_lease=lease)
                continue
            await self._proxy_return(url_ip, lease)
            return fr

    # -- robots ---------------------------------------------------------

    async def _robots(self, host: str, any_url: str, proxy_ip=None):
        now = time.monotonic()
        hit = self._robots_cache.get(host)
        if hit is not None and hit[0] > now:
            return hit[1]
        h, port, _, https = _split_host(any_url)
        scheme = "https" if https else "http"
        default = 443 if https else 80
        scheme_host = (
            f"{scheme}://{h}:{port}" if port != default else f"{scheme}://{h}"
        )
        if proxy_ip is not None and self.proxy is not None:
            lease = await self._proxy_get(proxy_ip)
            fr = await self._proxied_fetch(
                f"{scheme_host}/robots.txt", proxy_ip, lease, rotate=False
            )
        else:
            fr = await self._download(f"{scheme_host}/robots.txt")
        # non-200 (or error) robots = allow-all with no crawl-delay; the
        # reply is cached either way (Msg13.cpp:477-494 cache semantics)
        txt = ""
        if fr.http_status == 200:
            txt = to_utf8(fr.body, fr.content_type)
        pol = parse_robots(txt, self.ua)
        self._robots_cache[host] = (now + ROBOTS_TTL_S, pol)
        return pol

    # -- hammer queue ----------------------------------------------------

    async def _hammer_wait(self, ip: int, cd_ms: int) -> None:
        """Block until this IP may launch (addToHammerQueue semantics);
        marks the IP in-flight on return."""
        while True:
            last = self._last_dl.get(ip)
            now = time.monotonic() * 1000.0
            if last is None:
                break  # cache miss: first time, go (Msg13.cpp:2073)
            if last == 0:
                if cd_ms > 0:
                    await asyncio.sleep(HAMMER_SCAN_MS / 1000.0)
                    continue
                break  # no delay configured: concurrent ok
            if now - last >= cd_ms:
                break
            await asyncio.sleep(HAMMER_SCAN_MS / 1000.0)
        # no await between the check above and this mark: atomic in the
        # single-threaded loop, so two waiters cannot both pass
        self._last_dl[ip] = 0

    def _hammer_done(self, ip: int, start_ms: float) -> None:
        self._last_dl[ip] = (
            time.monotonic() * 1000.0 if self.crawl_delay_from_end else start_ms
        )

    # -- one launch row ---------------------------------------------------

    async def _fetch_one(self, url: str, host: str, ip: int, ims: int = 0) -> tuple:
        """Returns (_FetchResult, crawl_delay_ms, robots_allowed,
        elapsed_ms)."""
        t0 = time.monotonic()
        async with self._sem:
            # proxy decision (downloadTheDocForReals2, Msg13.cpp:615-644):
            # forced, or automatic for twitchy IPs
            use_proxy = self.force_use_proxies or (
                self.auto_use_proxies and ip in self._twitchy
            )
            pol = await self._robots(host, url, ip if use_proxy else None)
            cd = pol.crawl_delay_ms
            if not pol.is_allowed(get_path_with_query(url)):
                fr = _FetchResult()
                fr.err_code = urlfilter.ERR_ROBOTS_DENIED
                return fr, cd, False, (time.monotonic() - t0) * 1000.0
            acd = self.auto_crawl_delay_ms
            if ip in self._twitchy and (cd < 0 or cd < acd):
                eff_cd = acd  # Msg13.cpp:2030-2041
            else:
                eff_cd = max(cd, 0)
            lease = None
            if use_proxy:
                # lease before the hammer queue: its num_banned_proxies
                # drives the self-imposed delay (Msg13.cpp:2046-2052)
                lease = await self._proxy_get(ip)
                ban_cd = lease.num_banned_proxies * DELAYPERBAN_MS
                if ban_cd > eff_cd:
                    eff_cd = ban_cd
            was_twitchy = ip in self._twitchy  # m_wasInTableBeforeStarting
            await self._hammer_wait(ip, eff_cd)
            start_ms = time.monotonic() * 1000.0
            if lease is not None:
                fr = await self._proxied_fetch(url, ip, lease, ims=ims)
            else:
                fr = await self._download(url, ims=ims)
            self._hammer_done(ip, start_ms)
            if fr.banned and self.auto_backoff:
                self._twitchy.add(ip)  # addIpToTwitchyTable
                if not was_twitchy and lease is None:
                    # retry once with the new backoff (Msg13.cpp:1186-1206);
                    # proxied fetches already rotated through the broker
                    await self._hammer_wait(ip, self.auto_crawl_delay_ms)
                    start_ms = time.monotonic() * 1000.0
                    fr = await self._download(url, ims=ims)
                    self._hammer_done(ip, start_ms)
        if fr.http_status == 304 and ims > 0:
            # Not Modified to our conditional GET → EDOCUNCHANGED; the
            # reply builder rewrites it to a success with the old
            # content hash carried forward (XmlDoc.cpp:14780-14791).
            # Gated on ims > 0: a 304 to an UNconditional GET (no
            # If-Modified-Since sent, no prior reply to recycle) is a
            # server error and must stay an error-status reply.
            fr.err_code = urlfilter.ERR_DOC_UNCHANGED
            fr.body = b""
        return fr, cd, True, (time.monotonic() - t0) * 1000.0

    # -- batch contract ----------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        ips = (
            batch["first_ip"].to_numpy()
            if "first_ip" in batch.column_names
            else np.array([hash(h) & 0x7FFFFFFF for h in hosts])
        )
        launch_ms = batch["launch_ms"].to_numpy()
        # respider rows carry the previous reply's spidered time; used
        # for the conditional GET only when the parm is on
        if (
            self.use_if_modified_since
            and "prev_spidered_time" in batch.column_names
        ):
            ims_col = batch["prev_spidered_time"].to_numpy()
        else:
            ims_col = np.zeros(n, dtype=np.int64)

        async def run():
            if self._sem is None:
                self._sem = asyncio.Semaphore(self._max_connections)
            # in-flight identical-request dedup (Msg13.cpp:596-616):
            # identical URLs share one download
            tasks: dict = {}
            for u, h, ip, ims in zip(urls, hosts, ips, ims_col):
                if u not in tasks:
                    tasks[u] = asyncio.ensure_future(
                        self._fetch_one(u, h, int(ip), ims=int(ims))
                    )
            await asyncio.gather(*tasks.values())
            return {u: t.result() for u, t in tasks.items()}

        if self._loop is None:
            import threading

            self._loop = asyncio.new_event_loop()
            self._loop_thread = threading.Thread(
                target=self._loop.run_forever, daemon=True
            )
            self._loop_thread.start()
        results = asyncio.run_coroutine_threadsafe(run(), self._loop).result()

        status = np.zeros(n, dtype=np.int32)
        err = np.zeros(n, dtype=np.int32)
        cd_col = np.full(n, -1, dtype=np.int64)
        end = np.zeros(n, dtype=np.int64)
        allowed = np.zeros(n, dtype=bool)
        lastmod = np.full(n, -1, dtype=np.int64)
        htmls: list = []
        locs: list = []
        for i, u in enumerate(urls):
            fr, cd, ok, elapsed = results[u]
            status[i] = fr.http_status
            err[i] = fr.err_code
            cd_col[i] = cd
            allowed[i] = ok
            end[i] = launch_ms[i] + int(elapsed)
            lastmod[i] = fr.last_modified
            htmls.append(
                to_utf8(fr.body, fr.content_type) if fr.body else ""
            )
            locs.append(fr.location)
        out = batch
        for name, arr in [
            ("http_status", pa.array(status)),
            ("err_code", pa.array(err)),
            ("crawl_delay_ms", pa.array(cd_col)),
            ("download_end_ms", pa.array(end)),
            ("robots_allowed", pa.array(allowed)),
            ("html", pa.array(htmls, pa.string())),
            ("redir_location", pa.array(locs, pa.string())),
            ("last_modified", pa.array(lastmod)),
        ]:
            out = out.append_column(name, arr)
        return out
