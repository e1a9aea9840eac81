"""Socket-tier end-to-end benchmark: every production network tier of
the real-socket crawl pipeline live in ONE artifact (VERDICT r4 #9).

Two legs over the same deterministic localhost fixture web:

* ``dns_tls`` — hostnames resolve through the REAL ``DnsCache``
  (LRU + negative cache + in-flight dedup; fixture lookup answers
  127.0.0.1, origins listen on :80/:443 so URL ports are the defaults,
  exactly the production path) and one https host is fetched with full
  SNI + certificate verification against a SAN cert.
* ``proxy`` — every download (robots included) rides a REAL localhost
  forward proxy through the shared ProxyBroker actor: absolute-URI GET
  for http, CONNECT + ``start_tls`` tunneling for https — the
  reference's host-#0 msg-0x54 flow (SpiderProxy.cpp:874-882).

The point is regression visibility: the DNS cache, TLS client, proxy
allocator and conditional-GET plumbing used to be unit-tested only;
this bench runs them through ``run_http_crawl``'s full FrontierCore
scheduling loop and reports urls/s, so a slowdown or breakage in any
tier shows up in a recorded number (BASELINE.md "socket tier" rows),
not just in pytest.

Correctness is asserted inline: each leg must produce exactly the
fixture web's page count as docs — a fetch that silently bypassed the
proxy (or failed DNS) would change the count and crash the bench.
"""

from __future__ import annotations

import os
import time

from ..state.frontier import CrawlConfig
from ..functions.urlfilter import UrlFilterRule
from ..testing import (
    ForwardProxy,
    StaticSiteServer,
    local_dns_lookup,
    make_self_signed_cert,
    make_server_ssl_ctx,
)

TLS_HOST = "tls.test"


def make_web(n_hosts: int = 48, pages_per_host: int = 16) -> dict:
    """Deterministic multi-host fixture web: every root links all of its
    own pages plus the next and the 7th-next host's root (steps of +1
    keep the host graph connected from any seed), pages chain forward.
    Content is derived from (host, page) only — no RNG, so both legs
    and every rerun crawl the identical web."""
    hosts = [f"h{i:03d}.test" for i in range(n_hosts)]
    sites = {}
    for i, h in enumerate(hosts):
        own = "".join(
            f'<a href="/p{j}.html">p{j}</a> ' for j in range(1, pages_per_host)
        )
        cross = "".join(
            f'<a href="http://{hosts[(i + k) % n_hosts]}/">x{k}</a> '
            for k in (1, 7)
        )
        pages = {
            "/": (
                f"<html><head><title>{h}</title></head><body>"
                f"<h1>root of {h}</h1>{own}{cross}"
                f'<a href="https://{TLS_HOST}/">secure</a></body></html>'
            )
        }
        for j in range(1, pages_per_host):
            nxt = (
                f'<a href="/p{j + 1}.html">next</a>'
                if j + 1 < pages_per_host
                else ""
            )
            body = " ".join(f"token{(j * 31 + t) % 97}" for t in range(40))
            pages[f"/p{j}.html"] = (
                f"<html><head><title>{h} p{j}</title></head>"
                f"<body><p>{body}</p>{nxt}</body></html>"
            )
        sites[h] = pages
    return sites


def make_tls_site(tls_pages: int = 4) -> dict:
    pages = {
        "/": "<html><body><h1>secure root</h1>"
        + "".join(
            f'<a href="/s{j}.html">s{j}</a> ' for j in range(1, tls_pages)
        )
        + "</body></html>"
    }
    for j in range(1, tls_pages):
        pages[f"/s{j}.html"] = f"<html><body>secure page {j}</body></html>"
    return {TLS_HOST: pages}


def _crawl(seeds, out_dir, fetcher_kwargs, n_fetchers, same_ip_wait_ms):
    from .httpcrawl import run_http_crawl

    t0 = time.perf_counter()
    res = run_http_crawl(
        seeds=seeds,
        resolve=None,  # no fixture seam: DNS or proxy must carry it all
        out_dir=out_dir,
        cfg=CrawlConfig(
            num_partitions=4,
            horizon_ms=600_000,
            rules=(
                UrlFilterRule("default", 50, 30.0, 9, 7, same_ip_wait_ms),
            ),
        ),
        n_fetchers=n_fetchers,
        fetcher_kwargs=fetcher_kwargs,
    )
    dt = time.perf_counter() - t0
    import pyarrow.dataset as pads

    docs = pads.dataset(res["docs_dir"], format="parquet").to_table()
    return dt, docs.num_rows, res


def run_socket_bench(
    out_root: str,
    n_hosts: int = 48,
    pages_per_host: int = 16,
    tls_pages: int = 4,
    n_fetchers: int = 8,
    same_ip_wait_ms: int = 20,
    legs: tuple = ("dns_tls", "proxy"),
    dns_ports: tuple = (80, 443),
) -> dict:
    """Run the requested legs; returns {leg: {sec, docs, urls_per_s}}.

    Raises if any leg's doc count differs from the fixture web's page
    count — the inline correctness gate (see module docstring)."""
    os.makedirs(out_root, exist_ok=True)
    certfile, keyfile = make_self_signed_cert(TLS_HOST, out_root)
    sites = make_web(n_hosts, pages_per_host)
    tls_sites = make_tls_site(tls_pages)
    expected = n_hosts * pages_per_host + tls_pages
    seeds = [f"http://{h}/" for h in sorted(sites)[:: max(1, n_hosts // 12)]]
    seeds.append(f"https://{TLS_HOST}/")
    base_kw = {
        "ca_file": certfile,
        "connect_timeout_s": 5.0,
        "read_timeout_s": 5.0,
    }
    out = {}
    for leg in legs:
        srv = tsrv = proxy = None
        try:
            if leg == "dns_tls":
                from ..stages.dnscache import DnsCache

                srv = StaticSiteServer(sites, port=dns_ports[0]).start()
                tsrv = StaticSiteServer(
                    tls_sites,
                    ssl_ctx=make_server_ssl_ctx(certfile, keyfile),
                    port=dns_ports[1],
                ).start()
                kw = dict(base_kw, dns=DnsCache(lookup=local_dns_lookup))
            elif leg == "proxy":
                srv = StaticSiteServer(sites).start()
                tsrv = StaticSiteServer(
                    tls_sites, ssl_ctx=make_server_ssl_ctx(certfile, keyfile)
                ).start()
                proxy = ForwardProxy(srv.port, tsrv.port).start()
                kw = dict(
                    base_kw,
                    proxy=f"127.0.0.1:{proxy.port}",
                    force_use_proxies=True,
                )
            else:  # pragma: no cover - config error
                raise ValueError(leg)
            dt, ndocs, _ = _crawl(
                seeds,
                os.path.join(out_root, leg),
                kw,
                n_fetchers,
                same_ip_wait_ms,
            )
            if ndocs != expected:
                raise AssertionError(
                    f"socket bench leg {leg}: {ndocs} docs != {expected}"
                )
            if proxy is not None and not proxy.hits:
                raise AssertionError("proxy leg fetched nothing via proxy")
            out[leg] = {
                "sec": round(dt, 3),
                "docs": ndocs,
                "urls_per_s": round(ndocs / dt, 1),
            }
        finally:
            for s in (proxy, srv, tsrv):
                if s is not None:
                    s.stop()
    return out
