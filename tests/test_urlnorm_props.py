"""Property tests for URL canonicalization (functions/urlnorm.py).

The reference canonicalizer must never crash on hostile input
(Url.cpp is fed raw outlink bytes) and must be idempotent — a
canonical URL canonicalizes to itself (XmlDoc re-canonicalizes
outlinks it reads back from spiderdb)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_ray.functions.urlnorm import canonicalize

#: URL-ish fragments to splice into hostile inputs
_FRAGMENTS = st.sampled_from(
    [
        "http://", "https://", "HTTP://WWW.", "//", "..", "./", "?",
        "#frag", "&utm_source=x", ";jsessionid=ABCDEFGHIJ0123456789",
        "%2e%2e", "a.test", ":8080", ":80", "/p1.html", "javascript:",
        "mailto:x@y", " ", "\t", "média", "[::1]", "xn--", "%zz", "//..",
        "?PHPSESSID=0123456789abcdef0123456789abcdef", "&", "=", "!",
    ]
)


@st.composite
def urlish(draw):
    parts = draw(st.lists(_FRAGMENTS, min_size=0, max_size=8))
    noise = draw(st.text(max_size=12))
    return "".join(parts) + noise


@settings(max_examples=500, deadline=None)
@given(urlish())
def test_never_raises(u):
    out = canonicalize(u, "http://base.test/dir/page.html")
    assert out is None or isinstance(out, str)


@settings(max_examples=500, deadline=None)
@given(urlish())
def test_idempotent(u):
    out = canonicalize(u, "http://base.test/dir/page.html")
    if out is None:
        return
    again = canonicalize(out, None)
    assert again == out, (u, out, again)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=48))
def test_arbitrary_text_never_raises(u):
    out = canonicalize(u, None)
    assert out is None or isinstance(out, str)


def test_nameprep_space_hosts_rejected():
    """Pinned r4-verdict regression: nameprep maps some codepoints to
    SPACE inside a punycoded label (U+00A8 -> 'xn-- -ccb'), which the
    whitespace-truncation pass then mangles on re-canonicalization —
    a URL-seen/uh48 split-identity hazard.  Post-IDNA hosts outside
    [a-z0-9.-] are rejected (Url.cpp:964-1005 charset walk)."""
    # non-whitespace chars whose nameprep/NFKC expansion CONTAINS a
    # space (¨ ¯ ´ ¸): only the post-IDNA charset walk catches these
    for cp in ("¨", "¯", "´", "¸"):
        assert canonicalize(f"http://{cp}") is None
        assert canonicalize(f"http://a{cp}b.example.com/") is None
    # actual whitespace codepoints are handled upstream by the
    # truncation pass (Url.cpp:992-994) — host cut at the whitespace
    for cp in (" ", " ", " ", "　"):
        assert canonicalize(f"http://{cp}") is None
        assert canonicalize(f"http://a{cp}b.example.com/") == "http://a/"
    # U+200B is nameprep-DELETED (not whitespace): host fuses cleanly
    assert canonicalize("http://a​b.example.com/") == "http://ab.example.com/"
    # valid IDNA hosts still canonicalize (and idempotently)
    out = canonicalize("http://münchen.de/x")
    assert out == "http://xn--mnchen-3ya.de/x"
    assert canonicalize(out) == out
