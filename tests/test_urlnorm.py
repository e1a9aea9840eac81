"""Canonicalization unit vectors (reference test/unit/UrlTest.cpp style)."""

from open_source_search_engine_ray.functions.urlnorm import (
    canonicalize,
    get_domain,
    get_extension,
    get_host,
    get_path_with_query,
    get_tld,
    is_www,
    outlink_ok,
)

CASES = [
    # (raw, base, expected)
    ("http://www.Example.COM/Path", None, "http://www.example.com/Path"),
    ("HTTP://EXAMPLE.com", None, "http://example.com/"),
    ("example.com/x", None, "http://example.com/x"),
    ("http://example.com:80/x", None, "http://example.com/x"),
    ("https://example.com:443/x", None, "https://example.com/x"),
    ("http://example.com:8080/x", None, "http://example.com:8080/x"),
    ("http://example.com/a#frag", None, "http://example.com/a"),
    ("http://example.com/a?b=1#frag", None, "http://example.com/a?b=1"),
    ("http://example.com/a?PHPSESSID=123&b=2", None, "http://example.com/a?b=2"),
    ("http://example.com/a?phpsessid=9", None, "http://example.com/a"),
    ("http://example.com/a;jsessionid=ABC?x=1", None, "http://example.com/a?x=1"),
    ("http://example.com/a?CFID=1&CFTOKEN=2&keep=3", None, "http://example.com/a?keep=3"),
    ("  http://example.com/a \n", None, "http://example.com/a"),
    ("p2.html", "http://h.test/dir/p1.html", "http://h.test/dir/p2.html"),
    ("/p2.html", "http://h.test/dir/p1.html", "http://h.test/p2.html"),
    ("../up.html", "http://h.test/dir/p1.html", "http://h.test/up.html"),
    ("//other.test/x", "http://h.test/", "http://other.test/x"),
    ("http://bücher.example/", None, "http://xn--bcher-kva.example/"),
    ("ftp://example.com/x", None, None),
    ("javascript:void(0)", None, None),
    ("", None, None),
]


def test_canonicalize_cases():
    for raw, base, want in CASES:
        assert canonicalize(raw, base) == want, (raw, base)


def test_add_www():
    assert canonicalize("http://example.com/", add_www=True) == "http://www.example.com/"
    assert (
        canonicalize("http://sub.example.com/", add_www=True) == "http://sub.example.com/"
    )
    # reference Url.cpp:1223: only when host==domain and host contains a dot
    assert canonicalize("http://localhost/", add_www=True) == "http://localhost/"


def test_idempotent():
    for raw, base, want in CASES:
        if want is not None:
            assert canonicalize(want) == want


def test_decomposition():
    u = "http://www.h0001.test:8080/a/b.html?q=1"
    assert get_host(u) == "www.h0001.test"
    assert get_domain(u) == "h0001.test"
    assert get_tld(u) == "test"
    assert is_www(u)
    assert get_path_with_query(u) == "/a/b.html?q=1"
    assert get_extension(u) == "html"
    assert get_domain("http://a.co.uk/") == "a.co.uk"


def test_outlink_filter():
    src = "http://www.h0001.test/"
    assert outlink_ok("http://www.h0002.test/p1.html", src)
    assert not outlink_ok("http://www.h0001.test/img.jpg", src)  # media ext
    assert not outlink_ok("http://www.h0001.test/app.js", src)  # script ext
    assert not outlink_ok("http://x.test/d.json", src)  # json ext
    assert not outlink_ok("ftp://www.h0002.test/", src)
    assert not outlink_ok("http://ab/", src)  # host too short
    assert not outlink_ok("http://bad.xxx/", src)  # tld blacklist
    assert not outlink_ok(src, src)  # self link


def test_percent_encoding_of_non_ascii():
    from open_source_search_engine_ray.functions.urlnorm import canonicalize

    # non-ASCII path chars become uppercase UTF-8 %XX (urlEncode,
    # fctypes.cpp:932-980)
    assert canonicalize("http://x.test/café.html") == "http://x.test/caf%C3%A9.html"
    assert canonicalize("http://x.test/p?q=über") == "http://x.test/p?q=%C3%BCber"
    # existing escapes pass through untouched (no case folding, no decode)
    assert canonicalize("http://x.test/a%2fb%3F.html") == "http://x.test/a%2fb%3F.html"
    # IDNA host + unicode path together
    out = canonicalize("http://münchen.test/straße")
    assert out == "http://xn--mnchen-3ya.test/stra%C3%9Fe"
