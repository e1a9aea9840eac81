"""Smoke test for the socket-tier e2e bench: both legs (DnsCache+TLS
and forward-proxy) over a tiny fixture web.  Guards the wiring the
bench artifact depends on — run_http_crawl with resolve=None, the
picklable DnsCache/ca_file fetcher_kwargs, ProxyBroker spec strings,
and the TLS-capable StaticSiteServer."""

import socket

import pytest

from open_source_search_engine_ray.pipelines.socketbench import run_socket_bench


def _bindable(port: int) -> bool:
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", port))
        return True
    except OSError:
        return False
    finally:
        s.close()


def test_socket_bench_both_legs(ray_session, tmp_path):
    legs = ["proxy"]
    if _bindable(80) and _bindable(443):
        legs.insert(0, "dns_tls")
    else:  # pragma: no cover - sandboxed environments without root
        pytest.skip("ports 80/443 not bindable; dns_tls leg unavailable")
    out = run_socket_bench(
        str(tmp_path),
        n_hosts=6,
        pages_per_host=4,
        tls_pages=2,
        n_fetchers=2,
        same_ip_wait_ms=10,
        legs=tuple(legs),
    )
    assert set(out) == set(legs)
    for leg, row in out.items():
        # the count assertion lives inside run_socket_bench; re-check
        assert row["docs"] == 6 * 4 + 2, leg
        assert row["urls_per_s"] > 0
