"""Adult-content scoring (reference AdultCheck.cpp:11-496 s_dirtyWords,
getAdultPoints AdultCheck.cpp:498-538, threshold XmlDoc.cpp:3140-3142).

Semantics mirrored exactly: each needle that OCCURS in the text
contributes its weight ONCE (presence, not occurrence count); negative
weights are exception needles that cancel false positives ("sussex"
cancels "sex", "document" cancels "cum"); a document is adult when the
total reaches 2.  The needle table is the reference's data, duplicates
included (a duplicated needle contributes twice, as in the original
array scan)."""

from __future__ import annotations

import numpy as np

ADULT_THRESHOLD = 2  # XmlDoc.cpp:3142 — total >= 2 → adult

# (needle, weight): +2 strongly dirty, +1 needs corroboration,
# -1/-2 exception (AdultCheck.cpp s_dirtyWords, full first table)
DIRTY_NEEDLES: tuple = (
    ("upskirt", 2), ("downblouse", 2), ("shemale", 1), ("spank", 1),
    ("dildo", 2), ("bdsm", 2), ("voyeur", 2), ("fisting", 2),
    ("vibrator", 2), ("ejaculat", 2), ("rgasm", 2), ("orgy", 2),
    ("orgies", 2), ("stripper", 1), ("softcore", 2), ("whore", 2),
    ("slut", 1), ("smut", 2), ("tits", 2), ("lesbian", 2),
    ("swinger", 2), ("fetish", 2), ("nude", 1), ("centerfold", 2),
    ("incest", 2), ("pedophil", 2), ("pedofil", 2), ("horny", 2),
    ("pussy", 2), ("pussies", 2), ("penis", 2), ("vagina", 2),
    ("phuck", 2), ("blowjob", 2), ("blow job", 2), ("gangbang", 2),
    ("xxx", 1), ("porn", 2), ("felch", 2), ("cunt", 2),
    ("bestial", 2), ("beastial", 2), ("kink", 2), ("sex", 1),
    ("anal", 2), ("cum", 2), ("clit", 2), ("fuck", 2),
    ("boob", 1), ("wank", 2), ("fick", 2), ("eroti", 2),
    ("gay", 1), ("thong", 1), ("masturbat", 2), ("bitch", 1),
    ("hell", 1), ("damn", 1), ("rimjob", 2), ("cunnilingu", 2),
    ("felatio", 2), ("fellatio", 2), ("dick", 1), ("cock", 1),
    ("rape", 2), ("raping", 2), ("bukake", 2), ("shit", 2),
    ("naked", 1), ("nympho", 2), ("hardcore", 1), ("sodom", 2),
    ("titties", 2), ("twat", 2), ("bastard", 1), ("erotik", 2),
    # exceptions
    ("transmut", -2), ("bismuth", -2), ("middlesex", -1), ("sussex", -1),
    ("essex", -1), ("deusex", -1), ("sexchange", -1), ("sexpress", -1),
    ("sexpert", -1), ("middlesex", -1), ("sussex", -1), ("essex", -1),
    ("deusex", -1), ("sexchange", -1), ("sexpress", -1), ("sexpert", -1),
    ("sexcel", -1), ("sexist", -1), ("sexile", -1), ("sexperi", -1),
    ("sexual", -1), ("sexpose", -1), ("sexclu", -1), ("sexo", -1),
    ("sexism", -1), ("sexpan", -1), ("same-sex", -1), ("opposite sex", -1),
    ("analog", -2), ("analy", -2), ("canal", -2), ("kanal", -2),
    ("banal", -2), ("ianalbert", -2), ("circum", -2), ("cum laude", -2),
    ("succum", -2), ("cumber", -2), ("docum", -2), ("cumul", -2),
    ("acumen", -2), ("incum", -2), ("capsicum", -2), ("modicum", -2),
    ("locum", -2), ("scum", -2), ("accum", -2), ("cumbre", -2),
    ("swank", -2), ("fickle", -2), ("traffick", -2), ("scleroti", -2),
    ("gaylor", -2), ("gaynor", -2), ("gayner", -2), ("gayton", -2),
    ("dipthong", -1), ("hellen", -1), ("hellman", -1), ("shell", -1),
    ("mitchell", -1), ("chelle", -1), ("hello", -1), ("moschella", -1),
    ("othello", -1), ("schelling", -1), ("seychelles", -1), ("wheller", -1),
    ("winchell", -1), ("dicker", -1), ("dickins", -1), ("dickies", -1),
    ("dickran", -1), ("babcock", -1), ("cocked", -1), ("cocking", -1),
    ("cockpit", -1), ("cockroach", -1), ("cocktail", -1), ("cocky", -1),
    ("hancock", -1), ("hitchcock", -1), ("peacock", -1), ("shuttlecock", -1),
    ("stopcock", -1), ("weathercock", -1), ("woodcock", -1), ("cockburn", -1),
    ("kinko", -2), ("ukink", -2), ("snaked", -1), ("drape", -2),
    ("grape", -2), ("scrape", -2), ("therape", -2), ("trapez", -2),
    ("parapet", -2), ("scraping", -2), ("draping", -2), ("twatch", -2),
    ("heraclitus", -2), ("booboo", -1), ("shitak", -2), ("scunthorpe", -2),
)


def adult_points(text: str) -> int:
    """getAdultPoints: sum of weights of needles present in the text
    (case-insensitive substring, once per needle entry)."""
    low = text.lower()
    return sum(w for needle, w in DIRTY_NEEDLES if needle in low)


def is_adult(text: str) -> bool:
    return adult_points(text) >= ADULT_THRESHOLD


def adult_points_batch(texts) -> np.ndarray:
    return np.fromiter((adult_points(t) for t in texts), np.int64, len(texts))
