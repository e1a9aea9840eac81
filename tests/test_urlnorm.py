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
    # jsessionid path param: validator requires a >=20-char value
    # (Url.cpp:434, Validator(20,0,true)); short values are KEPT
    (
        "http://example.com/a;jsessionid=J4QMFWBG1SPRVWCKUUXCJ0W?x=1",
        None,
        "http://example.com/a?x=1",
    ),
    ("http://example.com/a;jsessionid=ABC?x=1", None, "http://example.com/a;jsessionid=ABC?x=1"),
    ("http://example.com/a?CFID=1&CFTOKEN=2&keep=3", None, "http://example.com/a?keep=3"),
    ("  http://example.com/a \n", None, "http://example.com/a"),
    # mid-URL whitespace TRUNCATES (Url.cpp:992-994)
    ("http://example.com/a b/c", None, "http://example.com/a"),
    # common double-scheme mistake collapses (Url.cpp:1012-1017)
    ("http://http://example.com/x", None, "http://example.com/x"),
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


def test_strip_parameters_validators():
    """Modern stripParameters port (Url.cpp:347-790): validator-gated
    session ids, unconditional tracking params, apache dir-sort, and
    domain-specific affiliate params — reference example values."""
    from open_source_search_engine_ray.functions.urlnorm import canonicalize as c

    # sid: >=30 chars strips; short product-id-like values are KEPT
    assert (
        c("http://b.test/d?sid=f320a739cdecb4c3edef67e0123456789&p=1")
        == "http://b.test/d?p=1"
    )
    assert c("http://b.test/d?sid=5&p=1") == "http://b.test/d?sid=5&p=1"
    # sid 6-char mixed-case (MANDATORY lower+upper)
    assert c("http://b.test/d?sid=aBcDeF") == "http://b.test/d"
    assert c("http://b.test/d?sid=abcdef") == "http://b.test/d?sid=abcdef"
    # sessionid needs >=20 chars with an alpha
    assert (
        c("http://b.test/d?sessionid=a1234567890123456789x")
        == "http://b.test/d"
    )
    assert c("http://b.test/d?sessionid=123") == "http://b.test/d?sessionid=123"
    # ts: exactly 13 digits (epoch millis)
    assert c("http://b.test/d?ts=1422344216175&x=2") == "http://b.test/d?x=2"
    assert c("http://b.test/d?ts=123&x=2") == "http://b.test/d?ts=123&x=2"
    # tracking params strip unconditionally
    assert (
        c("http://b.test/p?utm_source=k&utm_medium=b&utm_campaign=bpp&id=7")
        == "http://b.test/p?id=7"
    )
    assert c("http://b.test/p?gclid=XYZ") == "http://b.test/p"
    # apache dir sort (only when <=2 query params; C/O case-sensitive)
    assert c("http://b.test/dir/?C=N;O=A") == "http://b.test/dir/"
    assert c("http://b.test/dir/?C=N&keep=1&x=2") == "http://b.test/dir/?C=N&keep=1&x=2"
    # amazon affiliate tag only strips on amazon.* domains
    assert c("http://www.amazon.com/dp/1?tag=deals-20&x=1") == "http://www.amazon.com/dp/1?x=1"
    assert c("http://b.test/dp/1?tag=deals-20") == "http://b.test/dp/1?tag=deals-20"
    # path-segment session pairs (osCommerce style)
    assert (
        c("http://b.test/search/keywords/chardonnay/osCsid/45de8edd68f8bc05e9fde0d2c528a619/sort/3d/")
        == "http://b.test/search/keywords/chardonnay/sort/3d/"
    )
    # case-insensitive path pair: /CFID/<digits>/
    assert c("http://b.test/app/CFID/322257/x") == c("http://b.test/app/cfid/322257/x")
    # PHPSESSID query (partial matcher) still strips any value
    assert c("http://b.test/a?PHPSESSID=737aec14eb7b360983d4fe39395&p=1") == "http://b.test/a?p=1"


def test_strip_parameters_v122():
    """Legacy single-pass strip (stripParametersv122, Url.cpp:162-345):
    the reference's own comment examples, the one-match-per-pass
    behavior, the isSessionId rest-of-string guard, the >=5-char value
    rule and the no-alnum-before guard."""
    from open_source_search_engine_ray.functions.urlnorm import (
        canonicalize,
        strip_parameters_v122 as v122,
    )

    # comment examples (Url.cpp:164-170)
    assert (
        v122("http://www.b.com/p.jhtml;jsessionid=J4QMFWBG1SPRVWCKUUXCJ0W?pp=1")
        == "http://www.b.com/p.jhtml?pp=1"
    )
    assert (
        v122("http://www.b.com/?PHPSESSID=737aec14eb7b360983d4fe39395&p=1")
        == "http://www.b.com/?p=1"
    )
    assert (
        v122("http://www.b.com/default?SID=f320a739cdecb4c3edef67e&p=1")
        == "http://www.b.com/default?p=1"
    )
    # single pass: only the highest-priority match is removed
    assert (
        v122("http://k.com/blog?utm_source=kikolani&utm_medium=320banner")
        == "http://k.com/blog?utm_medium=320banner"
    )
    # lowercase sid= needs a lowercase-hex tail >= 12 chars to the END
    assert v122("http://b.com/?sid=abcdef123456") == "http://b.com/"
    assert (
        v122("http://b.com/?sid=abcdef123456&p=1")
        == "http://b.com/?sid=abcdef123456&p=1"
    )
    # value < 5 chars is kept (Url.cpp:324-326)
    assert v122("http://b.com/?jsessionid=abc") == "http://b.com/?jsessionid=abc"
    # no alnum before the needle: DAVESID= is not a session id
    assert v122("http://b.com/?DAVESID=abcdefgh") == "http://b.com/?DAVESID=abcdefgh"
    # .php?s= needs 32 hex chars
    assert (
        v122("http://f.com/t.php?s=8af9d6d0d59e8a3108f3bf3f64166f5a&x=1")
        == "http://f.com/t.php?x=1"
    )
    assert (
        v122("http://f.com/t.php?s=8af9d6&x=1") == "http://f.com/t.php?s=8af9d6&x=1"
    )
    # tracking params (BR 20160117 block); NB the ladder is priority-
    # ordered single-match: "elqat=" outranks "elqTrackId=", and a
    # matched-but-short value ABORTS the whole pass (Url.cpp:324-326)
    assert (
        v122("http://a.com/e/er?elqTrackId=3de2badc5d7c4a748bc302534682")
        == "http://a.com/e/er"
    )
    assert (
        v122("http://a.com/e/er?elqTrackId=3de2badc5d7c4a748bc302534682&elqat=2")
        == "http://a.com/e/er?elqTrackId=3de2badc5d7c4a748bc302534682&elqat=2"
    )
    # canonicalize gate: titledb_version <= 122 takes the legacy path
    legacy = canonicalize(
        "http://www.b.com/p.jhtml;jsessionid=J4QMFWBG1SPRVWCKUUXCJ0W?pp=1",
        titledb_version=122,
    )
    assert legacy == "http://www.b.com/p.jhtml?pp=1"
