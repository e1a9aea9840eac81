"""Async caching DNS resolver — the production DNS seam of the
real-socket fetch tier.

Reference semantics (Dns.cpp / Dns.h):

* **Positive + negative cache, 1-day TTL** — the reference caches both
  resolved IPs and EDNSTIMEDOUT / not-found answers for
  ``DNS_CACHE_MAX_AGE`` (1 day, Dns.h:26); a cached failure is an ip of
  -1/0 (Dns.cpp:351 "we now cached EDNSTIMEDOUT errors for a day, so
  *ip can be -1").  Here the cache maps host -> (expiry, addr|None,
  err_code); a hit with addr None re-raises the cached failure without
  touching the network.
* **In-flight request dedup** — a lookup already in progress chains the
  new caller onto the pending one instead of launching a duplicate
  (``s_dnstable`` callback chain, Dns.cpp:365-380); here an
  ``asyncio.Future`` per host plays that role.
* **Timed-out-server tier** — the reference keys a separate
  ``g_timedoutCache`` by *nameserver* IP (Dns.cpp:21,125-153,1293-1307)
  because it walks the delegation chain itself; stdlib ``getaddrinfo``
  hides the nameservers, so that tier collapses into the host-keyed
  negative cache with the (shorter) ``timeout_ttl_s``: a host whose
  lookup timed out is EDNSTIMEDOUT (-> ``ERR_DNS``, a tmp error, so the
  ``errorcount>=1 && hastmperror`` reschedule rule fires) until the
  entry expires.
* **Literal IPs pass through** without a lookup (Dns.cpp:340).

The cache is per fetch actor (same placement as the robots cache): the
frontier partitions URLs by first-IP/host, so each actor sees a stable
host population and the LRU stays hot.
"""

from __future__ import annotations

import asyncio
import time
from collections import OrderedDict

from ..functions import urlfilter

DNS_CACHE_MAX_AGE_S = 86400  # Dns.h:26 (positive AND negative)


def _is_ip_literal(host: str) -> bool:
    parts = host.split(".")
    return len(parts) == 4 and all(p.isdigit() for p in parts)


class DnsCache:
    """host -> address resolver with LRU + negative caching.

    ``lookup`` is an ``async (host) -> str`` coroutine returning the
    address (raising ``OSError`` on NXDOMAIN-style failure); default is
    stdlib ``getaddrinfo`` on the running loop.  ``resolve`` returns
    ``(addr | None, err_code)`` — ``ERR_DNS`` covers both not-found and
    timeout (EDNSDEAD / EDNSTIMEDOUT both map into the tmp-error set,
    Spider.cpp:2333-2344).
    """

    def __init__(
        self,
        lookup=None,
        max_entries: int = 100_000,
        ttl_s: float = DNS_CACHE_MAX_AGE_S,
        negative_ttl_s: float = DNS_CACHE_MAX_AGE_S,
        timeout_ttl_s: float = 600.0,
        timeout_s: float = 5.0,
    ):
        self._lookup = lookup
        self._max = max_entries
        self._ttl = ttl_s
        self._neg_ttl = negative_ttl_s
        self._timeout_ttl = timeout_ttl_s
        self._timeout_s = timeout_s
        self._cache: OrderedDict = OrderedDict()
        self._inflight: dict = {}
        self.lookups = 0  # network lookups issued (cache misses)
        self.hits = 0

    async def _default_lookup(self, host: str) -> str:
        infos = await asyncio.get_running_loop().getaddrinfo(host, 80)
        return infos[0][4][0]

    async def resolve(self, host: str) -> tuple:
        if _is_ip_literal(host):
            return host, urlfilter.ERR_NONE
        now = time.monotonic()
        hit = self._cache.get(host)
        if hit is not None:
            if hit[0] > now:
                self._cache.move_to_end(host)
                self.hits += 1
                return hit[1], hit[2]
            del self._cache[host]
        fut = self._inflight.get(host)
        if fut is not None:
            # duplicate-request chain (Dns.cpp:365-380)
            return await asyncio.shield(fut)
        fut = asyncio.get_running_loop().create_future()
        self._inflight[host] = fut
        try:
            addr, err, ttl = await self._resolve_uncached(host)
            self._store(host, addr, err, ttl)
            fut.set_result((addr, err))
            return addr, err
        except BaseException as e:  # pragma: no cover - cancellation
            if not fut.done():
                fut.set_exception(e)
                # consume so cancellation isn't logged as unretrieved
                fut.exception()
            raise
        finally:
            del self._inflight[host]

    async def _resolve_uncached(self, host: str) -> tuple:
        self.lookups += 1
        lookup = self._lookup or self._default_lookup
        try:
            addr = await asyncio.wait_for(lookup(host), self._timeout_s)
            return addr, urlfilter.ERR_NONE, self._ttl
        except asyncio.TimeoutError:
            # EDNSTIMEDOUT -> timed-out tier TTL
            return None, urlfilter.ERR_DNS, self._timeout_ttl
        except (OSError, UnicodeError, ValueError):
            # NXDOMAIN / EDNSDEAD -> negative cache TTL.  getaddrinfo
            # raises UnicodeError (a ValueError subclass) for hosts with
            # empty or >63-char labels — hostile outlinks reach here, so
            # treat them as NXDOMAIN rather than crashing the fetch batch.
            return None, urlfilter.ERR_DNS, self._neg_ttl

    def _store(self, host: str, addr, err: int, ttl: float) -> None:
        self._cache[host] = (time.monotonic() + ttl, addr, err)
        self._cache.move_to_end(host)
        while len(self._cache) > self._max:
            self._cache.popitem(last=False)
