"""guessCountryTLD kernel (LanguageIdentifier.cpp:4-31 +
CountryCode.cpp:14-270 abbr table) — branch pins incl. the reference's
quirks (http:// byte-offset anchoring, case-sensitive lookup)."""

from open_source_search_engine_ray.functions.countrycode import (
    COUNTRY_CODES,
    get_index_of_abbr,
    guess_country_tld,
)


def test_table_shape():
    assert len(COUNTRY_CODES) == 254
    assert COUNTRY_CODES[0] == "zz"
    assert get_index_of_abbr("zz") == 0  # unknown == miss
    assert COUNTRY_CODES[get_index_of_abbr("de")] == "de"
    assert get_index_of_abbr("q7") == 0


def test_branches():
    de = get_index_of_abbr("de")
    uk = get_index_of_abbr("uk")
    # ccTLD before '/', before ':'
    assert guess_country_tld("http://www.example.de/") == de
    assert guess_country_tld("http://www.example.de:8080/x") == de
    # prefix subdomain at url[7:9] (url[9] == '.')
    assert guess_country_tld("http://de.example.com/") == de
    # prefix wins over TLD
    assert guess_country_tld("http://uk.example.de/") == uk
    # misses: gTLDs, no terminator, uppercase (case-sensitive lookup),
    # https (offset-7 anchoring quirk), unknown prefix falls to TLD
    assert guess_country_tld("http://www.example.com/") == 0
    assert guess_country_tld("http://www.example.info/") == 0
    assert guess_country_tld("http://www.example.de") == 0
    assert guess_country_tld("http://www.example.DE/") == 0
    assert guess_country_tld("https://www.example.de/") == 0
    assert guess_country_tld("http://xx.example.de/") == de


def test_hostile_inputs():
    for u in ("", "http://", "http://x", "x" * 9, "http://..", "http://:/"):
        assert isinstance(guess_country_tld(u), int)
