"""robots.txt semantics (transcribed from reference test/unit/RobotsTest.cpp
coverage areas: UA groups, longest-path-first, wildcards, $ anchors,
crawl-delay)."""

from open_source_search_engine_ray.functions.robots import parse_robots

UA = "gigablastbot"


def allowed(txt, path, ua=UA):
    return parse_robots(txt, ua).is_allowed(path)


def test_no_robots_allows_all():
    p = parse_robots("", UA)
    assert p.is_allowed("/anything")
    assert p.crawl_delay_ms == -1


def test_default_group_disallow():
    txt = "User-agent: *\nDisallow: /private/\n"
    assert not allowed(txt, "/private/x.html")
    assert allowed(txt, "/public/x.html")


def test_ua_group_overrides_default_entirely():
    txt = (
        "User-agent: *\nDisallow: /\nCrawl-delay: 9\n"
        f"User-agent: {UA}\nDisallow: /private/\nCrawl-delay: 0.5\n"
    )
    p = parse_robots(txt, UA)
    assert p.is_allowed("/ok.html")
    assert not p.is_allowed("/private/x")
    # crawl-delay comes from the UA group, float seconds → ms truncated
    # (Robots.cpp:169-190)
    assert p.crawl_delay_ms == 500


def test_ua_prefix_match_case_insensitive():
    txt = "User-agent: GigaBLAST\nDisallow: /x/\n"
    assert not allowed(txt, "/x/1")  # "gigablastbot".startswith("gigablast")
    txt2 = "User-agent: otherbot\nDisallow: /\n"
    assert allowed(txt2, "/anything")  # group doesn't apply to us


def test_longest_path_wins():
    # Allow more-specific beats Disallow less-specific regardless of order
    txt = "User-agent: *\nDisallow: /private/\nAllow: /private/ok.html\n"
    assert allowed(txt, "/private/ok.html")
    assert not allowed(txt, "/private/no.html")


def test_wildcard_and_anchor():
    txt = "User-agent: *\nDisallow: /*.cgi$\n"
    assert not allowed(txt, "/a/b.cgi")
    assert allowed(txt, "/a/b.cgi?x=1")  # anchored: query breaks full match
    assert allowed(txt, "/a/b.cgix")
    txt2 = "User-agent: *\nDisallow: /a/*/c\n"
    assert not allowed(txt2, "/a/b/c")
    assert not allowed(txt2, "/a/b/cd")  # unanchored → prefix semantics
    assert allowed(txt2, "/a/bc")


def test_trailing_star_stripped():
    txt = "User-agent: *\nDisallow: /dir/*\n"
    assert not allowed(txt, "/dir/x")
    assert not allowed(txt, "/dir/")


def test_disallow_all_and_empty_disallow():
    assert not allowed("User-agent: *\nDisallow: /\n", "/")
    assert allowed("User-agent: *\nDisallow:\n", "/x")  # empty value = no rule


def test_comments_and_crawl_delay_clamp_input():
    txt = "# hi\nUser-agent: * # default\nCrawl-delay: 120\nDisallow: /p/\n"
    p = parse_robots(txt, UA)
    assert p.crawl_delay_ms == 120000  # clamping happens in the scheduler
    assert not p.is_allowed("/p/1")


def test_second_ua_line_after_records_starts_new_group():
    txt = (
        f"User-agent: {UA}\nDisallow: /a/\n"
        "User-agent: zbot\nDisallow: /b/\n"
    )
    assert not allowed(txt, "/a/1")
    assert allowed(txt, "/b/1")  # zbot's group, not ours


def test_query_included_in_match():
    txt = "User-agent: *\nDisallow: /search?q=\n"
    assert not allowed(txt, "/search?q=x")
    assert allowed(txt, "/search")


def test_multiple_specific_ua_groups_merge():
    # two groups matching our UA both contribute rules
    txt = f"User-agent: {UA}\nDisallow: /a/\n\nUser-agent: {UA}\nDisallow: /b/\n"
    assert not allowed(txt, "/a/1")
    assert not allowed(txt, "/b/1")


def test_crawl_delay_without_rules():
    p = parse_robots(f"User-agent: {UA}\nCrawl-delay: 1.5\n", UA)
    assert p.crawl_delay_ms == 1500
    assert p.is_allowed("/anything")


def test_leading_wildcard_rule():
    txt = "User-agent: *\nDisallow: */private/*\n"
    assert not allowed(txt, "/x/private/y")
    assert allowed(txt, "/x/public/y")
