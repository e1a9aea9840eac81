"""Country-from-URL guessing — a faithful port of the reference's
``LanguageIdentifier::guessCountryTLD`` (LanguageIdentifier.cpp:4-31)
over the ``CountryCode.cpp`` abbreviation table (s_countryCode,
CountryCode.cpp:14-270; index-in-list IS the country id, entry 0 "zz"
= unknown).

Reference quirks preserved on purpose (they ARE the spec):

- the scan is anchored at byte offset 7 (``url+7``) assuming an
  ``http://`` prefix — an https URL's columns shift and the prefix
  check inspects ``s://x.`` bytes instead (harmless: those never form
  a country code), exactly like the C;
- the two-letter-subdomain check fires only when ``url[9] == '.'``
  (e.g. ``http://de.example.com`` → Germany);
- otherwise the two chars before the first ``:`` (or ``/``) after
  offset 7 are tried as a ccTLD when preceded by a dot;
- lookups are case-sensitive against the lowercase table (an
  uppercase ccTLD misses, like the raw-byte hash lookup in
  ``CountryCode::getIndexOfAbbr``, CountryCode.cpp:886-896).
"""

from __future__ import annotations

#: s_countryCode (CountryCode.cpp:14-270): index == country id
COUNTRY_CODES = (
    "zz", "ad", "ae", "af", "ag", "ai", "al", "am", "an", "ao", "aq", "ar", "as",
    "at", "au", "aw", "az", "ba", "bb", "bd", "be", "bf", "bg", "bh", "bi", "bj",
    "bm", "bn", "bo", "br", "bs", "bt", "bv", "bw", "by", "bz", "ca", "cc", "cf",
    "cd", "cg", "ch", "ci", "ck", "cl", "cm", "cn", "co", "cr", "cs", "cu", "cv",
    "cx", "cy", "cz", "de", "dj", "dk", "dm", "do", "dz", "ec", "ee", "eg", "eh",
    "er", "es", "et", "fi", "fj", "fk", "fm", "fo", "fr", "fx", "ga", "gb", "gd",
    "ge", "gf", "gh", "gi", "gl", "gm", "gn", "gp", "gq", "gr", "gs", "gt", "gu",
    "gw", "gy", "hk", "hm", "hn", "hr", "ht", "hu", "id", "ie", "il", "in", "io",
    "iq", "ir", "is", "it", "jm", "jo", "jp", "ke", "kg", "kh", "ki", "km", "kn",
    "kp", "kr", "kw", "ky", "kz", "la", "lb", "lc", "li", "lk", "lr", "ls", "lt",
    "lu", "lv", "ly", "ma", "mc", "md", "mg", "mh", "mk", "ml", "mm", "mn", "mo",
    "mp", "mq", "mr", "ms", "mt", "mu", "mv", "mw", "mx", "my", "mz", "na", "nc",
    "ne", "nf", "ng", "ni", "nl", "no", "np", "nr", "nt", "nu", "nz", "om", "pa",
    "pe", "pf", "pg", "ph", "pk", "pl", "pm", "pn", "pr", "pt", "pw", "py", "qa",
    "re", "ro", "ru", "rw", "sa", "sb", "sc", "sd", "se", "sg", "sh", "si", "sj",
    "sk", "sl", "sm", "sn", "so", "sr", "st", "su", "sv", "sy", "sz", "tc", "td",
    "tf", "tg", "th", "tj", "tk", "tm", "tn", "to", "tp", "tr", "tt", "tv", "tw",
    "tz", "ua", "ug", "uk", "um", "us", "uy", "uz", "va", "vc", "ve", "vg", "vi",
    "vn", "vu", "wf", "ws", "ye", "yt", "yu", "za", "zm", "zr", "zw", "bl", "gg",
    "mf", "im", "je", "me", "ps", "rs", "tl",
)

ABBR_TO_INDEX = {c: i for i, c in enumerate(COUNTRY_CODES)}
ABBR_TO_INDEX.pop("zz")  # index 0 == unknown == lookup miss


def get_index_of_abbr(abbr: str) -> int:
    """CountryCode::getIndexOfAbbr (CountryCode.cpp:886-896): 0 on miss."""
    return ABBR_TO_INDEX.get(abbr, 0)


def guess_country_tld(url: str) -> int:
    """LanguageIdentifier::guessCountryTLD (LanguageIdentifier.cpp:4-31)."""
    # two-letter subdomain right after the (assumed) http:// prefix
    if len(url) > 9 and url[9] == ".":
        country = get_index_of_abbr(url[7:9])
        if country:
            return country
    # two-letter TLD: the chars before the first ':' else '/' after
    # offset 7, when preceded by a dot (strchr(url+7, ...) in the C)
    tail = url[7:]
    j = tail.find(":")
    if j < 0:
        j = tail.find("/")
    if j >= 3 and tail[j - 3] == ".":
        return get_index_of_abbr(tail[j - 3 + 1 : j])
    return 0
