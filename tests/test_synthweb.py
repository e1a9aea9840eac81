"""Synthetic web determinism + the span↔HTML round-trip invariant."""

import pyarrow as pa

from open_source_search_engine_ray.functions.urlnorm import canonicalize
from open_source_search_engine_ray.sources.synthweb import (
    FetchResult,
    SynthWeb,
    WebConfig,
    fetch_url,
    parse_html,
    render_html,
)


def test_deterministic():
    w1 = SynthWeb(WebConfig(n_hosts=20))
    w2 = SynthWeb(WebConfig(n_hosts=20))
    assert w1.hosts == w2.hosts
    assert (w1.page_counts == w2.page_counts).all()
    assert w1.page_spans(3, 1) == w2.page_spans(3, 1)


def test_span_roundtrip_all_pages():
    web = SynthWeb(WebConfig(n_hosts=12))
    for i, p in web.iter_pages():
        spans = web.page_spans(i, p)
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        assert parse_html(render_html(spans)) == spans


def test_url_page_inverse():
    web = SynthWeb(WebConfig(n_hosts=12))
    for i, p in web.iter_pages():
        assert web.url_to_page(web.page_url(i, p)) == (i, p)
    assert web.url_to_page("http://nosuch.test/") is None
    assert web.url_to_page("http://" + web.hosts[0] + "/p99999.html") is None


def test_documents_table_shape():
    web = SynthWeb(WebConfig(n_hosts=8))
    t = web.documents_table()
    assert t.column_names == ["doc_id", "spans"]
    assert t.num_rows == web.total_pages()
    f = t.schema.field("spans").type
    assert pa.types.is_list(f)
    assert {x.name for x in f.value_type} == {"kind", "text", "media_ref", "offset"}


def test_fetch_modes():
    web = SynthWeb(WebConfig(n_hosts=25))
    ok = fetch_url(web, web.page_url(0, 0))
    assert ok.http_status == 200 and ok.err_code == 0
    assert parse_html(ok.html) == web.page_spans(0, 0)
    # host 13 → dns failure, host 18 → http 500 (fail-mode table)
    dns = fetch_url(web, web.page_url(13, 0))
    assert dns.err_code != 0 and dns.http_status == 0
    e500 = fetch_url(web, web.page_url(18, 0))
    assert e500.http_status == 500
    missing = fetch_url(web, "http://" + web.hosts[0] + "/p777.html")
    assert missing.http_status == 404
    nohost = fetch_url(web, "http://unknown.test/")
    assert isinstance(nohost, FetchResult) and nohost.err_code != 0


def test_seeds_and_sitelist():
    web = SynthWeb(WebConfig(n_hosts=40))
    seeds = web.seeds()
    assert seeds
    for s in seeds:
        c = canonicalize(s)
        assert c is not None and web.url_to_page(c) is not None
    assert len(web.site_list()) < web.cfg.n_hosts  # some hosts excluded


def test_page_html_fused_renderer_byte_identical():
    """page_html (the fused hot-path renderer fetch_url uses) must be
    byte-identical to render_html(page_spans(...)) — same RNG draw
    order, same escaping — across dup-link variants and redirects."""
    from open_source_search_engine_ray.sources.synthweb import (
        WebConfig,
        get_web,
        render_html,
    )

    web = get_web(
        WebConfig(
            n_hosts=60, n_hubs=3, hub_pages=20, max_pages=8,
            dup_link_frac=0.5, redirect_frac=0.2,
        )
    )
    for i, p in web.iter_pages():
        t = web.page_url(i, p)
        assert web.page_html(i, p, title=t) == render_html(
            web.page_spans(i, p), title=t
        ), (i, p)
