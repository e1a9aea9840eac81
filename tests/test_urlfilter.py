"""URL-filter DSL evaluation vectors (reference Spider.cpp:2202-3703 and
the default web profile Collectiondb.cpp:1396-1622)."""

import numpy as np

from open_source_search_engine_ray.functions.urlfilter import (
    ERR_DNS,
    ERR_HTTP_404,
    FilterProgram,
    SiteList,
    UrlFilterRule,
    candidate_columns,
    default_web_rules,
)

WEB = FilterProgram(default_web_rules())


def cand(**kw):
    c = candidate_columns(1)
    c["url"][0] = kw.pop("url", "http://www.x.test/")
    c["tld"][0] = kw.pop("tld", "test")
    c["lang"][0] = kw.pop("lang", "en")
    c["in_sitelist"][0] = kw.pop("in_sitelist", True)
    for k, v in kw.items():
        c[k][0] = v
    return c


def rule_of(**kw):
    return int(WEB.assign(cand(**kw))[0])


def expr(i):
    return WEB.rules[i].expression


def test_default_profile_first_match_semantics():
    # new www root page in the site list → "hopcount==0 && iswww && isnew"
    assert expr(rule_of(hop_count=0, is_www=True)) == "hopcount==0 && iswww && isnew"
    # same but already replied → "hopcount==0 && iswww"
    assert expr(rule_of(hop_count=0, is_www=True, had_reply=True, spidered_time=50)) == (
        "hopcount==0 && iswww"
    )
    assert expr(rule_of(hop_count=1)) == "hopcount==1 && isnew"
    assert expr(rule_of(hop_count=7)) == "hopcount>=3 && isnew"
    assert expr(rule_of(hop_count=7, had_reply=True)) == "hopcount>=3"


def test_not_in_sitelist_force_delete():
    i = rule_of(hop_count=0, in_sitelist=False)
    assert expr(i) == "!ismanualadd && !insitelist"
    assert WEB.force_delete[i]
    # manual adds are exempt
    j = rule_of(hop_count=0, in_sitelist=False, is_addurl=True, is_manualadd=True)
    assert expr(j) == "isaddurl"


def test_error_retry_rules():
    # one tmp error → priority-45 retry rule
    i = rule_of(had_reply=True, err_count=1, err_code=ERR_DNS, spidered_time=10)
    assert expr(i) == "errorcount>=1 && hastmperror"
    # three tmp errors → delete
    i = rule_of(had_reply=True, err_count=3, err_code=ERR_DNS, spidered_time=10)
    assert expr(i) == "errorcount>=3 && hastmperror"
    assert WEB.force_delete[i]
    # permanent error (404) → "errorcount>=1" delete row
    i = rule_of(had_reply=True, err_count=1, err_code=ERR_HTTP_404, spidered_time=10)
    assert expr(i) == "errorcount>=1"
    assert WEB.force_delete[i]


def test_reindex_and_numinlinks():
    assert expr(rule_of(is_reindex=True)) == "isreindex"
    assert expr(rule_of(hop_count=2, num_inlinks=8)) == "numinlinks>7 && isnew"
    assert (
        expr(rule_of(hop_count=2, num_inlinks=8, had_reply=True)) == "numinlinks>7"
    )


def test_vectorized_assignment_order_independent():
    c = candidate_columns(3)
    c["url"][:] = ["http://a.test/", "http://b.test/", "http://c.test/"]
    c["tld"][:] = "test"
    c["lang"][:] = "en"
    c["in_sitelist"][:] = True
    c["hop_count"][:] = [0, 1, 9]
    got = WEB.assign(c)
    assert [expr(i) for i in got] == [
        "hopcount==0 && isnew",
        "hopcount==1 && isnew",
        "hopcount>=3 && isnew",
    ]


def test_custom_string_predicates():
    prog = FilterProgram(
        [
            UrlFilterRule("tld==gov,edu", 60, 7),
            UrlFilterRule("^http://news.", 55, 1),
            UrlFilterRule("$.rss", 53, 1),
            UrlFilterRule("forum", 22, 30),
            UrlFilterRule("lang!=en", 5, 90),
            UrlFilterRule("default", 1, 30),
        ]
    )
    def one(**kw):
        return prog.rules[int(prog.assign(cand(**kw))[0])].expression

    assert one(url="http://x.gov/", tld="gov") == "tld==gov,edu"
    assert one(url="http://news.x.test/") == "^http://news."
    assert one(url="http://x.test/feed.rss") == "$.rss"
    assert one(url="http://x.test/forum/1") == "forum"
    assert one(url="http://x.test/", lang="de") == "lang!=en"
    assert one(url="http://x.test/") == "default"


def test_site_list():
    sl = SiteList(
        [
            "h0001.test",
            "http://special.test/onlythis/",
            "contains:goodword",
            "-h0002.test",
            "# comment",
            "",
        ]
    )
    assert sl.matches("http://www.h0001.test/x", "h0001.test")
    assert not sl.matches("http://www.h0002.test/x", "h0002.test")
    assert sl.matches("http://special.test/onlythis/a.html", "special.test")
    assert not sl.matches("http://special.test/other/", "special.test")
    assert sl.matches("http://z.test/goodword/1", "z.test")
    m = sl.matches_batch(
        np.array(["http://www.h0001.test/", "http://q.test/"], dtype=object),
        np.array(["h0001.test", "q.test"], dtype=object),
    )
    assert m.tolist() == [True, False]


def test_first_match_is_order_dependent():
    # swapping rule order changes assignment — first-match semantics
    a = FilterProgram([UrlFilterRule("hopcount>=1", 10, 1), UrlFilterRule("hopcount>=2", 20, 1), UrlFilterRule("default", 1, 1)])
    b = FilterProgram([UrlFilterRule("hopcount>=2", 20, 1), UrlFilterRule("hopcount>=1", 10, 1), UrlFilterRule("default", 1, 1)])
    c = cand(hop_count=3)
    assert a.rules[int(a.assign(c)[0])].priority == 10
    assert b.rules[int(b.assign(c)[0])].priority == 20


def test_negated_numeric_and_conjunction():
    prog = FilterProgram([
        UrlFilterRule("!hopcount==0 && errorcount>=1", 33, 1),
        UrlFilterRule("default", 1, 1),
    ])
    hit = prog.assign(cand(hop_count=2, err_count=1, had_reply=True, spidered_time=5))
    assert prog.rules[int(hit[0])].priority == 33
    miss = prog.assign(cand(hop_count=0, err_count=1, had_reply=True, spidered_time=5))
    assert prog.rules[int(miss[0])].priority == 1


def test_no_match_returns_minus_one():
    prog = FilterProgram([UrlFilterRule("hopcount>=9", 5, 1)])  # no default row
    assert int(prog.assign(cand(hop_count=0))[0]) == -1


# -- extended predicates (Spider.cpp:2270-3560) ------------------------------


def _one(prog, **kw):
    i = int(prog.assign(cand(**kw))[0])
    return prog.rules[i].expression if i >= 0 else None


def test_isroot_and_url_flag_helpers():
    from open_source_search_engine_ray.functions.urlfilter import (
        url_is_permalink_format,
        url_is_root,
        url_is_rssext,
    )

    assert url_is_root("http://x.test/")
    assert url_is_root("https://x.test")
    assert not url_is_root("http://x.test/p1.html")
    assert url_is_rssext("http://x.test/feed.rss")
    assert url_is_rssext("http://x.test/feed.rss?x=1")  # query stripped, path ext wins
    assert not url_is_rssext("http://x.test/page.html")
    # permalink format guess (Linkdb.cpp:4734-4886)
    assert url_is_permalink_format("http://b.test/2019/05/my-first-post.html")
    assert url_is_permalink_format("http://b.test/?p=12345")
    assert url_is_permalink_format("http://b.test/archive/post_one_here")
    assert not url_is_permalink_format("http://b.test/")  # root
    assert not url_is_permalink_format("http://b.test/about.html")  # no digits/hyphens
    assert not url_is_permalink_format("http://b.test/feed.rss")  # rss
    assert not url_is_permalink_format("http://b.test/?m=200806")  # archive cgi
    assert not url_is_permalink_format("http://b.test/tag/some-topic-here/")  # /tag/
    prog = FilterProgram([
        UrlFilterRule("isroot", 70, 1),
        UrlFilterRule("ispermalinkformat", 60, 1),
        UrlFilterRule("isrssext", 50, 1),
        UrlFilterRule("default", 1, 1),
    ])
    assert _one(prog, is_root=True) == "isroot"
    assert _one(prog, is_permalink_format=True) == "ispermalinkformat"
    assert _one(prog, is_rssext=True) == "isrssext"
    assert _one(prog) == "default"


def test_reply_gated_booleans_and_authority():
    prog = FilterProgram([
        UrlFilterRule("isrss", 80, 1),
        UrlFilterRule("ispermalink", 70, 1),
        UrlFilterRule("hasauthorityinlink", 60, 1),
        UrlFilterRule("default", 1, 1),
    ])
    # without a reply the reply-gated predicates never match
    assert _one(prog, is_rss=True, is_permalink=True) == "default"
    assert _one(prog, is_rss=True, had_reply=True, spidered_time=5) == "isrss"
    assert _one(prog, is_permalink=True, had_reply=True, spidered_time=5) == "ispermalink"
    # authority info is never valid → the rule never matches (both forms)
    assert _one(prog, has_authority_inlink=True) == "default"
    prog2 = FilterProgram([
        UrlFilterRule("!hasauthorityinlink", 60, 1), UrlFilterRule("default", 1, 1)
    ])
    assert _one(prog2) == "default"


def test_isdocidbased_ispingserver_isfakeip():
    prog = FilterProgram([
        UrlFilterRule("isdocidbased", 80, 1),
        UrlFilterRule("ispingserver", 70, 1),
        UrlFilterRule("isfakeip", 60, 1),
        UrlFilterRule("default", 1, 1),
    ])
    assert _one(prog, is_reindex=True) == "isdocidbased"
    assert _one(prog, fake_first_ip=True) == "isfakeip"
    # Url::isPingServer is hardwired false (Url.cpp:2548)
    assert _one(prog, is_pingserver=False) == "default"


def test_numeric_quota_and_age_predicates():
    prog = FilterProgram([
        UrlFilterRule("sitepages>=10", 80, 1),
        UrlFilterRule("domainpages>=20", 70, 1),
        UrlFilterRule("spiderwaited>=100", 60, 1),
        UrlFilterRule("urlage>=1000", 50, 1),
        UrlFilterRule("percentchangedperday>=25.0", 40, 1),
        UrlFilterRule("age>=5", 30, 1),
        UrlFilterRule("default", 1, 1),
    ])
    assert _one(prog, sitepages=11) == "sitepages>=10"
    assert _one(prog, domainpages=25) == "domainpages>=20"
    # spiderwaited requires a reply
    assert _one(prog, spiderwaited=500) == "default"
    assert _one(prog, spiderwaited=500, had_reply=True, spidered_time=5) == "spiderwaited>=100"
    assert _one(prog, url_age=2000) == "urlage>=1000"
    assert (
        _one(prog, percentchangedperday=50.0, had_reply=True, spidered_time=5)
        == "percentchangedperday>=25.0"
    )
    # age: pubdate<=0 never matches (the reference ships pubdate=0)
    assert _one(prog, age=-1) == "default"
    assert _one(prog, age=10) == "age>=5"


def test_tag_predicate_and_tagged_sitelist():
    sl = SiteList(["tag:shallow h0001.test", "h0002.test"])
    urls = np.array(["http://www.h0001.test/", "http://www.h0002.test/"], dtype=object)
    doms = np.array(["h0001.test", "h0002.test"], dtype=object)
    assert sl.matches_batch(urls, doms).tolist() == [True, True]
    assert sl.tags_batch(urls, doms).tolist() == ["shallow", ""]
    prog = FilterProgram([
        UrlFilterRule("tag:shallow && hopcount>=2", 30, 40, 0),
        UrlFilterRule("default", 1, 1),
    ])
    assert _one(prog, site_tag="shallow", hop_count=3) == "tag:shallow && hopcount>=2"
    assert _one(prog, site_tag="", hop_count=3) == "default"
    assert _one(prog, site_tag="shallow", hop_count=1) == "default"


def test_profiles_compile_and_differ():
    from open_source_search_engine_ray.functions.urlfilter import (
        privacore_rules,
        shallow_rules,
    )

    priv = FilterProgram(privacore_rules())
    shal = FilterProgram(shallow_rules())
    # privacore: blacklisted tld force-deletes
    i = int(priv.assign(cand(url="http://x.cn/", tld="cn"))[0])
    assert priv.force_delete[i] and not priv.harvest_links[i]
    # privacore: non-whitelisted lang force-deletes
    i = int(priv.assign(cand(lang="zh", had_reply=True, spidered_time=5))[0])
    assert priv.force_delete[i]
    # shallow: tagged site at hopcount 2 maps to the max_spiders=0 row
    i = int(shal.assign(cand(site_tag="shallow", hop_count=2))[0])
    assert shal.rules[i].expression == "tag:shallow && hopcount>=2"
    assert shal.max_spiders_per_rule[i] == 0


def test_lint_rules_flags_mistyped_predicates():
    """The substring fallback for unknown tokens is reference behavior
    (Spider.cpp:3642-3696), but lint_rules flags tokens that LOOK like
    mistyped predicates (comparison operators / bare tag:) so a typo'd
    rule doesn't silently become a URL pattern."""
    from open_source_search_engine_ray.functions.urlfilter import (
        PROFILES,
        UrlFilterRule as R,
        default_web_rules,
        lint_rules,
    )

    assert lint_rules(default_web_rules()) == []
    for prof in PROFILES.values():
        assert lint_rules(prof()) == []
    w = lint_rules(
        [
            R("hopcountt>=1", 50, 1.0),   # typo'd numeric predicate
            R("tag:", 50, 1.0),            # malformed tag
            R("PHPSESSID", 50, 1.0),       # legit substring pattern
            R("^http://x.test/", 50, 1.0),  # legit prefix pattern
        ]
    )
    assert len(w) == 2
    assert "hopcountt>=1" in w[0] and "tag:" in w[1]
