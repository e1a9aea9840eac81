"""Spider-proxy allocation: the reference's host-#0 proxy broker.

Re-expresses SpiderProxy.cpp's msg-0x54 handler (`handleRequest54`,
SpiderProxy.cpp:479-825) and `returnProxy` (SpiderProxy.cpp:829-871) as
a plain-Python allocator plus a thin Ray-actor wrapper:

* **Proxy table** (`buildProxyTable`, SpiderProxy.cpp:119-247): parsed
  from a config string of ``ip:port [user:pwd]`` entries separated by
  whitespace or commas; each entry keeps the reference's per-proxy
  stats (`m_numDownloadRequests`, `m_lastDownloadError`, `m_timesUsed`).
* **Load table** (`s_loadTable` of `LoadBucket`s, SpiderProxy.cpp:276-
  312): one bucket per outstanding-or-recent download keyed by the
  target URL's IP; completed buckets expire after ``LOADPOINT_EXPIRE_MS``
  (15 s, SpiderProxy.cpp:14), at most 100 reaped per request
  (SpiderProxy.cpp:795-822), with a full flush when >10k entries have
  accumulated for >120 s (SpiderProxy.cpp:779-790).
* **Ban table** (`s_proxyBannedTable` keyed by (urlIp, proxyIp),
  SpiderProxy.cpp:503-525): a requester that detected an IP-ban through
  a proxy sends the pair back; `s_banCountTable` counts unique url-IPs
  per proxy for stats.
* **Winner selection** (SpiderProxy.cpp:531-720): per-request, count
  each proxy's in-flight downloads for this url-IP and its most recent
  completed-download time; prefer non-dead (no `m_lastDownloadError`)
  non-banned proxies; limit the candidate window to a doubling
  "threshold" ladder driven by how many proxies this url-IP has already
  banned (1 → 2 → 4 → 8 ... SpiderProxy.cpp:620-650) so bans roll over
  to fresh proxies gradually instead of burning the whole pool; among
  the window pick the lowest in-flight count, ties broken by the
  longest-idle proxy; the scan starts at ``urlIp % len(proxies)`` so
  different sites don't all pound the first proxy.
* **Backoff feedback**: the reply carries ``num_banned_proxies`` which
  the fetcher turns into a self-imposed crawl delay of
  ``num_banned * DELAYPERBAN`` ms (Msg13.cpp:1991,2046-2052).

Clocks are injected (``now_ms``) so tests and the virtual-clock crawl
stay deterministic; the Ray wrapper defaults to wall time.
"""

from __future__ import annotations

import time

LOADPOINT_EXPIRE_MS = 15 * 1000  # SpiderProxy.cpp:14
LOADTABLE_FLUSH_SLOTS = 10000  # SpiderProxy.cpp:786
LOADTABLE_FLUSH_S = 120  # SpiderProxy.cpp:785
DELAYPERBAN_MS = 500  # Msg13.cpp:1991


class SpiderProxyEntry:
    """One configured proxy (SpiderProxy, SpiderProxy.h:23-60)."""

    __slots__ = (
        "ip",
        "port",
        "userpwd",
        "last_download_error",
        "num_download_requests",
        "num_outstanding",
        "times_used",
        # per-request scoring scratch (m_countForThisIp /
        # m_lastTimeUsedForThisIp, SpiderProxy.h:54-56)
        "_count_for_ip",
        "_last_used_for_ip",
    )

    def __init__(self, ip: str, port: int, userpwd: str = ""):
        self.ip = ip
        self.port = port
        self.userpwd = userpwd
        self.last_download_error = 0
        self.num_download_requests = 0
        self.num_outstanding = 0
        self.times_used = 0
        self._count_for_ip = 0
        self._last_used_for_ip = 0

    def key(self) -> tuple:
        return (self.ip, self.port)


class _LoadBucket:
    __slots__ = ("url_ip", "proxy_key", "start_ms", "end_ms", "id")

    def __init__(self, url_ip, proxy_key, start_ms, lb_id):
        self.url_ip = url_ip
        self.proxy_key = proxy_key
        self.start_ms = start_ms
        self.end_ms = 0
        self.id = lb_id


class ProxyLease:
    """What msg-0x54 replies with (ProxyReply, SpiderProxy.h:86-108)."""

    __slots__ = (
        "ip",
        "port",
        "userpwd",
        "lb_id",
        "num_banned_proxies",
        "has_more_proxies_to_try",
    )

    def __init__(self, ip, port, userpwd, lb_id, num_banned, has_more):
        self.ip = ip
        self.port = port
        self.userpwd = userpwd
        self.lb_id = lb_id
        self.num_banned_proxies = num_banned
        self.has_more_proxies_to_try = has_more

    def key(self) -> tuple:
        return (self.ip, self.port)


def _ban_threshold(num_banned: int) -> int:
    """Candidate-window size from the per-url-IP ban count — the
    doubling ladder of SpiderProxy.cpp:620-650: use 1 proxy while none
    are banned; when it gets banned open the next 2; when those are
    banned the next 4; and so on (the odd-looking middle rungs keep the
    window shrinking back to the next power of two as bans accumulate
    inside a rung)."""
    b = num_banned
    if b <= 0:
        t = 1
    elif b == 1:
        t = 2
    elif b < 1 + 2:
        t = 3 - b
    elif b == 3:
        t = 4
    elif b < 3 + 4:
        t = 7 - b
    elif b == 7:
        t = 8
    elif b < 7 + 8:
        t = 15 - b
    elif b == 15:
        t = 16
    elif b < 15 + 16:
        t = 31 - b
    elif b == 31:
        t = 32
    elif b < 31 + 32:
        t = 63 - b
    elif b == 63:
        t = 64
    elif b < 63 + 64:
        t = 127 - b
    elif b == 127:
        t = 128
    elif b < 127 + 128:
        t = 255 - b
    elif b == 255:
        t = 256
    elif b < 255 + 256:
        t = 512 - b  # the reference's own irregular rung
    elif b == 511:
        t = 512
    elif b < 511 + 512:
        t = 1024 - b
    else:
        t = 1024
    return t if t > 0 else 1  # SpiderProxy.cpp:653-657 clamp


def parse_proxy_spec(spec) -> list:
    """``"1.2.3.4:8080 user:pwd, 5.6.7.8:3128"`` -> [SpiderProxyEntry].
    Mirrors buildProxyTable's tokenizer (SpiderProxy.cpp:119-247): an
    entry is host:port optionally followed by a user:pwd token; entries
    separated by whitespace or commas."""
    if isinstance(spec, (list, tuple)):
        toks = []
        for s in spec:
            toks.extend(str(s).replace(",", " ").split())
    else:
        toks = str(spec).replace(",", " ").split()
    out = []
    for tok in toks:
        host, colon, port = tok.rpartition(":")
        if colon and port.isdigit():
            out.append(SpiderProxyEntry(host, int(port)))
        elif out and colon:
            out[-1].userpwd = tok  # a user:pwd rider for the last proxy
    return out


class ProxyAllocator:
    """The host-#0 singleton state (SpiderProxy.cpp statics)."""

    def __init__(self, proxies):
        if (
            isinstance(proxies, (list, tuple))
            and proxies
            and isinstance(proxies[0], SpiderProxyEntry)
        ):
            self.proxies = list(proxies)
        else:
            self.proxies = parse_proxy_spec(proxies)
        if not self.proxies:
            raise ValueError("proxy spec parsed to zero proxies")
        self._by_key = {p.key(): p for p in self.proxies}
        self._buckets: list = []  # s_loadTable (allow-dups per urlIp)
        self._banned: set = set()  # (url_ip, proxy_key)
        self.ban_count: dict = {}  # proxy_key -> unique url-IPs banning it
        self._next_lb_id = 0
        self._last_flush_s = None

    # -- stats / health ------------------------------------------------

    def mark_error(self, proxy_key: tuple, err: int) -> None:
        """Record a failed download through this proxy (the reference
        learns this from the periodic test-url downloads that set
        m_lastDownloadError, SpiderProxy.cpp:313-470; we feed it from
        real download outcomes)."""
        p = self._by_key.get(tuple(proxy_key))
        if p is not None:
            p.last_download_error = int(err)

    def mark_ok(self, proxy_key: tuple) -> None:
        p = self._by_key.get(tuple(proxy_key))
        if p is not None:
            p.last_download_error = 0

    def stats(self) -> list:
        return [
            {
                "ip": p.ip,
                "port": p.port,
                "requests": p.num_download_requests,
                "outstanding": p.num_outstanding,
                "times_used": p.times_used,
                "last_error": p.last_download_error,
                "ban_count": self.ban_count.get(p.key(), 0),
            }
            for p in self.proxies
        ]

    # -- msg 0x55: done with the proxy ----------------------------------

    def return_proxy(self, url_ip: int, proxy_key, lb_id: int,
                     now_ms=None) -> None:
        """returnProxy (SpiderProxy.cpp:829-871): stamp the bucket's
        download-end time and drop the outstanding count."""
        now_ms = time.time() * 1000.0 if now_ms is None else now_ms
        proxy_key = tuple(proxy_key)
        for lb in self._buckets:
            if (
                lb.url_ip == url_ip
                and lb.id == lb_id
                and lb.proxy_key == proxy_key
                and lb.end_ms == 0
            ):
                lb.end_ms = now_ms
                break
        p = self._by_key.get(proxy_key)
        if p is not None and p.num_outstanding > 0:
            p.num_outstanding -= 1

    # -- msg 0x54: get a proxy -------------------------------------------

    def get_proxy(self, url_ip: int, ban_proxy_key=None, ban_lb_id=None,
                  now_ms=None) -> ProxyLease:
        """handleRequest54 (SpiderProxy.cpp:479-825)."""
        now_ms = time.time() * 1000.0 if now_ms is None else now_ms

        if ban_proxy_key is not None:
            # "return" the banned proxy, then ban the (urlIp, proxy) pair
            bk = tuple(ban_proxy_key)
            self.return_proxy(url_ip, bk, ban_lb_id, now_ms=now_ms)
            if (url_ip, bk) not in self._banned:
                self._banned.add((url_ip, bk))
                self.ban_count[bk] = self.ban_count.get(bk, 0) + 1

        # score pass: in-flight count + last completed time for this IP
        for p in self.proxies:
            p._count_for_ip = 0
            p._last_used_for_ip = 0
        for lb in self._buckets:
            if lb.url_ip != url_ip:
                continue
            p = self._by_key.get(lb.proxy_key)
            if p is None:
                continue
            if lb.end_ms == 0:
                p._count_for_ip += 1
            elif lb.end_ms > p._last_used_for_ip:
                p._last_used_for_ip = lb.end_ms

        # candidate census (SpiderProxy.cpp:577-612)
        skip_dead = True
        num_banned = 0
        alive = 0
        min_count = None
        for p in self.proxies:
            if (url_ip, p.key()) in self._banned:
                num_banned += 1
                continue
            if p.last_download_error:
                continue
            alive += 1
            if min_count is None or p._count_for_ip < min_count:
                min_count = p._count_for_ip
        if min_count is None:
            skip_dead = False  # all dead/banned: best dead one wins

        threshold = _ban_threshold(num_banned)

        # winner scan (SpiderProxy.cpp:659-720): start at urlIp % n so
        # sites spread over the pool, honor the threshold window, pick
        # min in-flight count, tie -> longest idle
        n = len(self.proxies)
        start = (url_ip & 0xFFFFFFFF) % n
        winner = None
        w_count = None
        w_oldest = None
        count = 0
        for off in range(n):
            p = self.proxies[(start + off) % n]
            if skip_dead:
                if p.last_download_error:
                    continue
                if (url_ip, p.key()) in self._banned:
                    continue
                if count >= threshold:
                    continue
            count += 1
            if winner is not None and p._count_for_ip > w_count:
                continue
            if (
                winner is not None
                and p._count_for_ip == w_count
                and p._last_used_for_ip >= w_oldest
            ):
                continue
            winner = p
            w_count = p._count_for_ip
            w_oldest = p._last_used_for_ip
        assert winner is not None  # parse guarantees >=1 proxy

        lb = _LoadBucket(url_ip, winner.key(), now_ms, self._next_lb_id)
        self._next_lb_id += 1
        self._buckets.append(lb)
        winner.times_used += 1
        winner.num_download_requests += 1
        winner.num_outstanding += 1

        self._reap(now_ms)

        return ProxyLease(
            winner.ip,
            winner.port,
            winner.userpwd,
            lb.id,
            num_banned,
            alive > 1,
        )

    # -- load-table hygiene ------------------------------------------------

    def _reap(self, now_ms: float) -> None:
        now_s = now_ms / 1000.0
        if self._last_flush_s is None:
            self._last_flush_s = now_s
        if (
            now_s - self._last_flush_s > LOADTABLE_FLUSH_S
            and len(self._buckets) > LOADTABLE_FLUSH_SLOTS
        ):
            self._buckets.clear()  # SpiderProxy.cpp:779-790
            self._last_flush_s = now_s
            return
        # completed buckets older than LOADPOINT_EXPIRE_MS, <=100/call
        keep = []
        reaped = 0
        for lb in self._buckets:
            if (
                reaped < 100
                and lb.end_ms
                and now_ms - lb.end_ms >= LOADPOINT_EXPIRE_MS
            ):
                reaped += 1
                continue
            keep.append(lb)
        if reaped:
            self._buckets = keep


def make_proxy_broker(proxies):
    """The cluster form: one named Ray actor holding the allocator —
    the reference's host #0 (initSpiderProxyStuff registers the 0x54
    handler only there, SpiderProxy.cpp:874-882). Fetch actors hold the
    handle and pay one tiny RPC per proxied download, exactly like the
    reference's UDP round trip."""
    import ray

    @ray.remote(num_cpus=0.01)
    class ProxyBroker:
        def __init__(self, spec):
            self.alloc = ProxyAllocator(spec)

        def get_proxy(self, url_ip, ban_proxy_key=None, ban_lb_id=None):
            le = self.alloc.get_proxy(url_ip, ban_proxy_key, ban_lb_id)
            return (
                le.ip,
                le.port,
                le.userpwd,
                le.lb_id,
                le.num_banned_proxies,
                le.has_more_proxies_to_try,
            )

        def return_proxy(self, url_ip, proxy_key, lb_id):
            self.alloc.return_proxy(url_ip, tuple(proxy_key), lb_id)

        def mark_error(self, proxy_key, err):
            self.alloc.mark_error(tuple(proxy_key), err)

        def mark_ok(self, proxy_key):
            self.alloc.mark_ok(tuple(proxy_key))

        def stats(self):
            return self.alloc.stats()

    return ProxyBroker.remote(proxies)
