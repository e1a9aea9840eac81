"""Fuzz the crawl_robots SQL oracle against the Python parser.

The oracle in __ray_entry__ restates the full Robots.cpp semantics in
SQL (group state machine, rule normalization, longest-match).  The
fixture only exercises six template bodies; this test generates random
robots.txt bodies from a grammar of the constructs the parser supports
(UA groups incl. prefix/mismatch, allow/disallow with anchors and
wildcards, crawl-delay, comments, unknown fields, blank/garbage lines)
and checks row-for-row agreement on a grid of test paths."""

import random

import duckdb
import pandas as pd

import __ray_entry__ as entrymod
from open_source_search_engine_ray.functions.robots import parse_robots

PATHS = [
    "/",
    "/p1.html",
    "/private/p4.html",
    "/private/ok.html",
    "/x.cgi",
    "/x.cgi?q=1",
    "/a/b/c.html",
    "/cgi/deep/x.cgi",
]

UAS = ["*", "gigablastbot", "giga", "otherbot", "gigablastbotXL", ""]
RULE_PATHS = [
    "/",
    "/private/",
    "/private/ok.html",
    "/*.cgi$",
    "/p",
    "/a/*/c.html",
    "*",
    "/x.cgi$",
    "/deep*",
    "",
]


def _random_body(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(0, 14)):
        kind = rng.randint(0, 9)
        if kind <= 2:
            lines.append(f"User-agent: {rng.choice(UAS)}")
        elif kind <= 5:
            fld = rng.choice(["Allow", "Disallow"])
            lines.append(f"{fld}: {rng.choice(RULE_PATHS)}")
        elif kind == 6:
            lines.append(
                f"Crawl-delay: {rng.choice(['0.5', '2', '120', 'oops', '0'])}"
            )
        elif kind == 7:
            lines.append("# a comment line")
        elif kind == 8:
            lines.append(f"Sitemap: http://x.test/map.xml")
        else:
            lines.append(rng.choice(["", "   ", "garbage without colon"]))
        if rng.random() < 0.2:
            lines[-1] += "  # trailing comment"
    return "\n".join(lines) + ("\n" if lines and rng.random() < 0.8 else "")


def _sql_for(bodies: dict) -> str:
    # the same template oracle_sql() renders, with our generated hosts
    new_hosts = ",".join(
        "('{}','{}')".format(h, b.replace("'", "''")) for h, b in bodies.items()
    )
    path_values = ",".join(f"('{p}')" for p in PATHS)
    return entrymod.ROBOTS_SQL_TEMPLATE.replace("@HOSTS@", new_hosts).replace(
        "@PATHS@", path_values
    )


def test_robots_sql_oracle_fuzz():
    rng = random.Random(20260818)
    bodies = {f"h{i:03d}.test": _random_body(rng) for i in range(120)}
    # python side
    rows = []
    for h in sorted(bodies):
        pol = parse_robots(bodies[h], "gigablastbot")
        for p in PATHS:
            rows.append((h, p, pol.is_allowed(p), pol.crawl_delay_ms))
    py = pd.DataFrame(
        rows, columns=["host", "path", "allowed", "crawl_delay_ms"]
    )
    # sql side
    sql = _sql_for(bodies)
    sq = duckdb.connect().execute(sql).df()
    sq = sq.sort_values(["host", "path"]).reset_index(drop=True)
    py = py.sort_values(["host", "path"]).reset_index(drop=True)
    for col in ("host", "path", "allowed", "crawl_delay_ms"):
        mism = (py[col].to_numpy() != sq[col].to_numpy()).nonzero()[0]
        assert len(mism) == 0, (
            col,
            py.iloc[mism[0]].to_dict(),
            sq.iloc[mism[0]].to_dict(),
            bodies[py.iloc[mism[0]]["host"]],
        )
