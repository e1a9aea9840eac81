"""FetchStage + ParseStage: the actor-pool map_batches stages.

FetchStage ↔ Msg13::getDoc (Msg13.cpp:125-765): robots gate (cached per
host, 24 h TTL in the reference, Msg13.cpp:477-494), then the download.
In this sandbox the "network" is the procedural SynthWeb; a production
deployment replaces ``fetch_url`` with an async HTTP client and keeps
the batch contract identical.

ParseStage ↔ XmlDoc's parse chain (Xml/Words/Links,
XmlDoc.cpp:3244-3938) + reply/outlink assembly
(XmlDoc.cpp:14548-15520): emits one unified record batch holding doc
rows (span sequences), the SpiderReply, and admitted outlink
SpiderRequests, each tagged with its target frontier partition.

Both are callable classes: constructed once per actor
(``map_batches(Cls, concurrency=N)``), so robots caches, compiled
regexes, and the SynthWeb config live per-actor, not per-batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import gbhash, urlfilter
from ..functions.robots import parse_robots
from ..functions.urlnorm import get_path_with_query, outlink_ok
from ..sources.synthweb import SynthWeb, WebConfig, fetch_url, parse_html
from ..state.frontier import part_of_ip
from .canonicalize import make_request_columns

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

FETCH_OUT_FIELDS = [
    ("http_status", pa.int32()),
    ("err_code", pa.int32()),
    ("crawl_delay_ms", pa.int64()),
    ("download_end_ms", pa.int64()),
    ("robots_allowed", pa.bool_()),
    ("html", pa.string()),
]

# unified parse-output schema; rec ∈ {doc, reply, request}
RECORD_SCHEMA = pa.schema(
    [
        ("rec", pa.string()),
        ("part", pa.int32()),
        # request fields
        ("url", pa.string()),
        ("uh48", pa.uint64()),
        ("first_ip", pa.int64()),
        ("host", pa.string()),
        ("dom_hash32", pa.int64()),
        ("site_hash32", pa.int64()),
        ("hop_count", pa.int32()),
        ("added_time", pa.int64()),
        ("parent_ip", pa.int64()),
        ("is_injecting", pa.bool_()),
        ("is_addurl", pa.bool_()),
        ("is_reindex", pa.bool_()),
        ("fake_first_ip", pa.bool_()),
        # reply fields
        ("spidered_time", pa.int64()),
        ("download_end_ms", pa.int64()),
        ("err_code", pa.int32()),
        ("http_status", pa.int32()),
        ("crawl_delay_ms", pa.int64()),
        ("lang", pa.string()),
        ("content_hash32", pa.int64()),
        # doc fields
        ("doc_id", pa.string()),
        ("spans", SPAN_TYPE),
        ("wave", pa.int64()),
    ]
)


class FetchStage:
    def __init__(self, web_cfg: WebConfig, user_agent: str = "gigablastbot"):
        self.web = SynthWeb(web_cfg)
        self.ua = user_agent
        self._robots_cache: dict = {}  # host -> RobotsPolicy

    def _policy(self, host: str, robots_txt: str):
        pol = self._robots_cache.get(host)
        if pol is None:
            pol = parse_robots(robots_txt, self.ua)
            self._robots_cache[host] = pol
        return pol

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        launch_ms = batch["launch_ms"].to_numpy()
        status = np.zeros(n, dtype=np.int32)
        err = np.zeros(n, dtype=np.int32)
        cd = np.full(n, -1, dtype=np.int64)
        end = np.zeros(n, dtype=np.int64)
        allowed = np.zeros(n, dtype=bool)
        htmls: list[str] = []
        hosts = batch["host"].to_pylist()
        for i, u in enumerate(urls):
            fr = fetch_url(self.web, u)
            pol = self._policy(hosts[i], fr.robots_txt)
            cd[i] = pol.crawl_delay_ms
            ok = pol.is_allowed(get_path_with_query(u))
            allowed[i] = ok
            if not ok:
                # robots denial = error reply (reference: EDOCDISALLOWED →
                # error path, XmlDoc.cpp:7115-7360)
                err[i] = urlfilter.ERR_ROBOTS_DENIED
                status[i] = 0
                end[i] = launch_ms[i] + fr.latency_ms  # robots fetch cost
                htmls.append("")
                continue
            status[i] = fr.http_status
            err[i] = fr.err_code
            end[i] = launch_ms[i] + fr.latency_ms
            htmls.append(fr.html)
        out = batch
        for name, arr in [
            ("http_status", pa.array(status)),
            ("err_code", pa.array(err)),
            ("crawl_delay_ms", pa.array(cd)),
            ("download_end_ms", pa.array(end)),
            ("robots_allowed", pa.array(allowed)),
            ("html", pa.array(htmls, pa.string())),
        ]:
            out = out.append_column(name, arr)
        return out


class ParseStage:
    def __init__(self, web_cfg: WebConfig, num_partitions: int):
        self.web = SynthWeb(web_cfg)
        self.host_ip = {h: int(ip) for h, ip in zip(self.web.hosts, self.web.ips)}
        self.P = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        n = batch.num_rows
        b = batch.to_pylist()
        for r in b:
            end_s = r["download_end_ms"] // 1000
            html = r["html"]
            spans = parse_html(html) if html else []
            lang = "en"
            reply = {
                "rec": "reply",
                "part": part_of_ip(r["first_ip"], self.P),
                "uh48": r["uh48"],
                "first_ip": r["first_ip"],
                "dom_hash32": r["dom_hash32"],
                "spidered_time": end_s,
                "download_end_ms": r["download_end_ms"],
                "err_code": r["err_code"],
                "http_status": r["http_status"],
                "crawl_delay_ms": r["crawl_delay_ms"],
                "lang": lang,
                "content_hash32": gbhash.hash32(html) if html else 0,
                "wave": r["wave"],
            }
            rows.append(reply)
            if r["err_code"] == 0 and r["http_status"] == 200:
                rows.append(
                    {
                        "rec": "doc",
                        "part": part_of_ip(r["first_ip"], self.P),
                        "doc_id": r["url"],
                        "uh48": r["uh48"],
                        "spans": spans,
                        "wave": r["wave"],
                    }
                )
                if r["harvest_links"]:
                    links = [s["media_ref"] for s in spans if s["kind"] == "link"]
                    if links:
                        cols = make_request_columns(
                            links,
                            self.host_ip,
                            bases=[r["url"]] * len(links),
                            hop_count=r["hop_count"] + 1,
                            added_time=end_s,
                            parent_ip=r["first_ip"],
                            drop=lambda c, src=r["url"]: not outlink_ok(c, src),
                        )
                        # per-page outlink dedup (XmlDoc.cpp:15263-15272)
                        seen_page: set = set()
                        for j in range(len(cols["url"])):
                            u48 = int(cols["uh48"][j])
                            if u48 in seen_page:
                                continue
                            seen_page.add(u48)
                            rows.append(
                                {
                                    "rec": "request",
                                    "part": part_of_ip(int(cols["first_ip"][j]), self.P),
                                    "url": cols["url"][j],
                                    "uh48": u48,
                                    "first_ip": int(cols["first_ip"][j]),
                                    "host": cols["host"][j],
                                    "dom_hash32": int(cols["dom_hash32"][j]),
                                    "site_hash32": int(cols["site_hash32"][j]),
                                    "hop_count": int(cols["hop_count"][j]),
                                    "added_time": int(cols["added_time"][j]),
                                    "parent_ip": int(cols["parent_ip"][j]),
                                    "is_injecting": False,
                                    "is_addurl": False,
                                    "is_reindex": False,
                                    "fake_first_ip": False,
                                    "wave": r["wave"],
                                }
                            )
        if not rows:
            return RECORD_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# task-mode wrappers: plain functions for map_batches that reuse a cached
# per-worker-process stage instance.  A politeness-bound crawl produces many
# small waves; spinning an actor pool per wave costs more than the work, so
# small waves run as stateless tasks with this cache while large waves use
# the actor-pool classes above (CrawlConfig.stage_mode).
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=4)
def _cached_fetch(web_cfg: WebConfig, ua: str) -> FetchStage:
    return FetchStage(web_cfg, ua)


@lru_cache(maxsize=4)
def _cached_parse(web_cfg: WebConfig, P: int) -> ParseStage:
    return ParseStage(web_cfg, P)


def fetch_batch(batch: pa.Table, *, web_cfg: WebConfig, user_agent: str) -> pa.Table:
    return _cached_fetch(web_cfg, user_agent)(batch)


def parse_batch(batch: pa.Table, *, web_cfg: WebConfig, num_partitions: int) -> pa.Table:
    return _cached_parse(web_cfg, num_partitions)(batch)
