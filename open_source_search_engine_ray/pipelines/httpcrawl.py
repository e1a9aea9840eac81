"""Real-socket crawl tier: the production fetch contract end-to-end.

The SynthWeb engine (pipelines/crawl.py) exercises the frontier at
throughput scale with a procedural network; this pipeline wires the SAME
FrontierCore scheduling semantics to REAL sockets:

    FrontierCore.schedule(wall_ms)  --launch batches-->
        HttpFetchStage actor pool   (robots gate, hammer-queue
                                     politeness, twitchy backoff,
                                     tmp-error taxonomy — stages/httpfetch)
        → real-HTML span extraction (sources/htmlparse: full entity
          decoding; charset chain applied in the fetch tier)
        → docs parquet + reply/outlink route-back → re-arm

Reference lifecycle: SpiderLoop::spiderDoledUrls → Msg13::getDoc →
XmlDoc::indexDoc → Links harvest → Msg4 scatter (Spider.cpp:5100-5340,
Msg13.cpp:125-765, XmlDoc.cpp:15007-15520).

Politeness domains land on exactly one fetch actor (launch rows route
by hash(first_ip) % n_fetchers) so the per-IP hammer clocks and twitchy
tables are authoritative — the same partitioning invariant the frontier
itself uses.  Tables cross actor boundaries as Arrow IPC bytes (see
crawl.py's serializer note).

DNS seam: politeness first-IPs are the deterministic per-host pseudo-IPs
of the synthetic resolver (stages/canonicalize.resolve_ip); the socket
address comes from the ``resolve`` map (in production both come from the
same resolver, XmlDoc.cpp:6553-6578).
"""

from __future__ import annotations

import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.textstats import lang_id
from ..functions.urlfilter import ERR_DOC_UNCHANGED
from ..sources.htmlparse import extract_span_rows
from ..stages.canonicalize import make_request_columns, split_by_partition
from ..stages.fetch import SPAN_TYPE
from ..stages.httpfetch import HttpFetchStage
from ..state.frontier import INF, CrawlConfig, FrontierCore, part_of_ip
from .crawl import ipc_to_table, table_to_ipc

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("uh48", pa.uint64()),
        ("spans", SPAN_TYPE),
        ("wave", pa.int64()),
    ]
)

REDIRECT_STATUSES = frozenset({301, 302, 303, 307, 308})


class _FetchActor(HttpFetchStage):
    """HttpFetchStage + IPC transport for actor boundaries."""

    def fetch_ipc(self, blob: bytes) -> bytes:
        return table_to_ipc(self(ipc_to_table(blob)))


def _reply_cols(launch: pa.Table, fetched: pa.Table, langs: list, hashes) -> dict:
    end = fetched["download_end_ms"].to_numpy()
    return {
        "uh48": launch["uh48"].to_numpy(),
        "first_ip": launch["first_ip"].to_numpy(),
        "dom_hash32": launch["dom_hash32"].to_numpy(),
        "spidered_time": end // 1000,
        "download_end_ms": end,
        "err_code": fetched["err_code"].to_numpy(),
        "http_status": fetched["http_status"].to_numpy(),
        "crawl_delay_ms": fetched["crawl_delay_ms"].to_numpy(),
        "lang": np.array(langs, dtype=object),
        "content_hash32": np.asarray(hashes, dtype=np.int64),
    }


def run_http_crawl(
    seeds: list,
    resolve: dict,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    user_agent: str = "gigablastbot",
    n_fetchers: int = 2,
    fetcher_kwargs: dict | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    max_waves: int = 0,
) -> dict:
    """Crawl a real HTTP web from ``seeds``; ``resolve`` maps host →
    (addr, port) (the localhost fixture seam; None entries DNS-fail).
    Runs on the wall clock — robots crawl-delays become real gaps.
    Returns {metrics, launch_log (pa.Table), url_seen, docs_dir}.

    ``checkpoint_every``: write per-partition FrontierCore checkpoints
    (+ MANIFEST with the crawl-clock position) every N waves, between
    waves so no fetch is in flight.  ``resume`` restores them: the
    crawl clock continues from the checkpointed position, doc files
    from post-checkpoint waves are dropped (they respider), and the
    launch log / URL-seen live in the checkpointed core buffers.
    ``max_waves``: stop after N waves this call (simulated kill).
    """
    import json

    import ray

    cfg = cfg or CrawlConfig(num_partitions=2, horizon_ms=120_000)
    os.makedirs(os.path.join(out_dir, "docs"), exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    manifest_path = os.path.join(ckpt_dir, "MANIFEST.json")
    P = cfg.num_partitions

    # epoch offset: the filter DSL encodes "has a reply" as
    # spidered_time > 0 (Spider.cpp treats time 0 as unset), so the
    # crawl clock starts at 1s to keep first-second replies visible
    epoch_ms = 1000
    wave = 0
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        cores = []
        for p in range(manifest["partitions"]):
            with open(os.path.join(ckpt_dir, f"part-{p:05d}.ckpt"), "rb") as f:
                cores.append(FrontierCore.from_checkpoint_bytes(f.read()))
        P = manifest["partitions"]
        wave = manifest["wave"]
        epoch_ms = manifest["now"]  # clock continues where it stopped
        for name in os.listdir(os.path.join(out_dir, "docs")):
            if name.startswith("wave-") and int(name[5:].split(".")[0]) >= wave:
                os.remove(os.path.join(out_dir, "docs", name))
    else:
        cores = [FrontierCore(p, cfg) for p in range(P)]
        # seeds: canonicalize + pseudo-IP politeness keys ({} → every
        # host gets the deterministic hash-derived first_ip)
        cols = make_request_columns(seeds, {}, hop_count=0, added_time=0)
        for p, sub in split_by_partition(cols, P):
            cores[p].add_requests(sub)

    def _checkpoint(now_ms: int) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        for p, core in enumerate(cores):
            tmp = os.path.join(ckpt_dir, f".tmp-{p:05d}")
            with open(tmp, "wb") as f:
                f.write(core.checkpoint_bytes({"wave": wave}))
            os.replace(tmp, os.path.join(ckpt_dir, f"part-{p:05d}.ckpt"))
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"wave": wave, "now": now_ms, "partitions": P}, f)
        os.replace(tmp, manifest_path)

    Actor = ray.remote(num_cpus=0.1)(_FetchActor)
    kw = dict(fetcher_kwargs or {})
    kw.setdefault("resolve", resolve)
    if isinstance(kw.get("proxy"), (str, list, tuple)):
        # a config spec means the centralized host-#0 form: ONE broker
        # actor shared by every fetcher (initSpiderProxyStuff registers
        # the 0x54 handler only on host #0, SpiderProxy.cpp:874-882)
        from ..state.proxy import make_proxy_broker

        kw["proxy"] = make_proxy_broker(kw["proxy"])
    fetchers = [Actor.remote(user_agent=user_agent, **kw) for _ in range(n_fetchers)]

    wave0 = wave
    t0 = time.monotonic()
    metrics = {"launched": 0, "completed": 0, "errors": 0, "docs": 0, "unchanged": 0}
    while True:
        nxt = min(c.next_event_ms() for c in cores)
        if nxt >= INF or nxt > cfg.horizon_ms:
            break
        if max_waves and wave - wave0 >= max_waves:
            break
        wall = int((time.monotonic() - t0) * 1000) + epoch_ms
        if nxt > wall:
            time.sleep((nxt - wall) / 1000.0)
            wall = int((time.monotonic() - t0) * 1000) + epoch_ms
        now = max(wall, nxt)
        if checkpoint_every and wave > wave0 and (wave - wave0) % checkpoint_every == 0:
            _checkpoint(now)
        launches = []
        for c in cores:
            t = c.schedule(now, wave)
            if not t.num_rows:
                continue
            # old-doc state for respider rows (XmlDoc.cpp:8157-8162):
            # drives the conditional GET + unchanged-content recycle.
            # Appended AFTER schedule() so the durable launch log keeps
            # the LAUNCH_SCHEMA shape.
            prev = c.prev_reply_state(t["uh48"].to_numpy())
            t = (
                t.append_column(
                    "prev_spidered_time", pa.array(prev["prev_spidered_time"])
                )
                .append_column(
                    "prev_content_hash32",
                    pa.array(prev["prev_content_hash32"]),
                )
                .append_column(
                    "prev_lang",
                    pa.array(prev["prev_lang"].tolist(), pa.string()),
                )
            )
            launches.append(t)
        wave += 1
        if not launches:
            continue
        launch = pa.concat_tables(launches)
        metrics["launched"] += launch.num_rows

        # route each politeness domain to exactly one fetch actor
        ips = launch["first_ip"].to_numpy()
        fparts = np.fromiter(
            (part_of_ip(ip, n_fetchers) for ip in ips), np.int64, len(ips)
        )
        futs = {}
        for f in np.unique(fparts):
            sub = launch.filter(pa.array(fparts == f))
            futs[int(f)] = (sub, fetchers[int(f)].fetch_ipc.remote(table_to_ipc(sub)))

        doc_ids: list = []
        doc_uh: list = []
        doc_spans: list = []
        doc_lastmod: list = []
        for f, (sub, fut) in futs.items():
            fetched = ipc_to_table(ray.get(fut))
            urls = sub["url"].to_pylist()
            hops = sub["hop_count"].to_numpy()
            harvest = sub["harvest_links"].to_numpy()
            statuses = fetched["http_status"].to_numpy()
            errs = fetched["err_code"].to_numpy()
            htmls = fetched["html"].to_pylist()
            redirs = fetched["redir_location"].to_pylist()
            lastmods = fetched["last_modified"].to_numpy()

            prevh = sub["prev_content_hash32"].to_numpy()
            prevl = sub["prev_lang"].to_pylist()

            langs = []
            hashes = []
            out_urls: list = []
            out_bases: list = []
            out_hops: list = []
            unch_304: list = []  # row idx: 304 replies to rewrite
            for i, url in enumerate(urls):
                html = htmls[i]
                if int(errs[i]) == ERR_DOC_UNCHANGED:
                    # 304 to our conditional GET: success reply with the
                    # old content hash + langId carried forward
                    # (XmlDoc.cpp:14757,14780-14800); content recycled —
                    # no doc rewrite, no re-harvest
                    hashes.append(int(prevh[i]))
                    langs.append(prevl[i] or "xx")
                    unch_304.append(i)
                    metrics["unchanged"] += 1
                    continue
                h32 = zlib.crc32(html.encode()) if html else 0
                hashes.append(h32)
                if int(statuses[i]) in REDIRECT_STATUSES and redirs[i]:
                    # redirect = hop-preserving outlink (XmlDoc.cpp:15377)
                    out_urls.append(redirs[i])
                    out_bases.append(url)
                    out_hops.append(int(hops[i]))
                if int(statuses[i]) != 200 or int(errs[i]) != 0 or not html:
                    langs.append("xx")
                    metrics["errors"] += int(errs[i]) != 0
                    continue
                if prevh[i] and h32 == int(prevh[i]):
                    # downloaded but identical to the old doc
                    # (getContentHash32Fast match, Msg13.cpp:1434-1446 →
                    # EDOCUNCHANGED → recycleContent): reply is already
                    # a success with the same hash; skip reindex/harvest
                    langs.append(prevl[i] or "xx")
                    metrics["unchanged"] += 1
                    continue
                spans = extract_span_rows(html)
                text = " ".join(
                    s["text"] for s in spans if s["kind"] == "text"
                )
                langs.append(lang_id(text))
                doc_ids.append(url)
                doc_uh.append(int(sub["uh48"][i].as_py()))
                doc_spans.append(spans)
                doc_lastmod.append(int(lastmods[i]))
                if harvest[i]:
                    for s in spans:
                        if s["kind"] == "link":
                            out_urls.append(s["media_ref"])
                            out_bases.append(url)
                            out_hops.append(int(hops[i]) + 1)
            metrics["completed"] += len(urls)

            # replies back to the owning cores
            rep = _reply_cols(sub, fetched, langs, hashes)
            if unch_304:
                # EDOCUNCHANGED reply rewrite (XmlDoc.cpp:14780-14791):
                # errCode 0, errCount reset via err 0, "call it 200"
                for k, v in (("err_code", 0), ("http_status", 200)):
                    a = rep[k].copy()
                    a[unch_304] = v
                    rep[k] = a
            rparts = np.fromiter(
                (part_of_ip(ip, P) for ip in rep["first_ip"]), np.int64, len(urls)
            )
            for p in np.unique(rparts):
                idx = np.nonzero(rparts == p)[0]
                cores[int(p)].complete({k: v[idx] for k, v in rep.items()})

            # outlinks → new requests
            if out_urls:
                ocols = make_request_columns(
                    out_urls,
                    {},
                    bases=out_bases,
                    hop_count=np.asarray(out_hops, dtype=np.int64),
                    added_time=now // 1000,
                    drop=lambda u: not u.startswith("http"),
                )
                for p, sub_o in split_by_partition(ocols, P):
                    cores[p].add_requests(sub_o)

        if doc_ids:
            t = pa.table(
                {
                    "doc_id": pa.array(doc_ids, pa.string()),
                    "uh48": pa.array(np.asarray(doc_uh, dtype=np.uint64)),
                    "spans": pa.array(doc_spans, SPAN_TYPE),
                    "last_modified": pa.array(
                        np.asarray(doc_lastmod, dtype=np.int64)
                    ),
                    "wave": pa.array([wave - 1] * len(doc_ids), pa.int64()),
                }
            )
            pq.write_table(
                t, os.path.join(out_dir, "docs", f"wave-{wave - 1:05d}.parquet")
            )
            metrics["docs"] += len(doc_ids)

    if checkpoint_every:
        _checkpoint(int((time.monotonic() - t0) * 1000) + epoch_ms)
    for a in fetchers:
        ray.kill(a)
    # the launch log and URL-seen live in the cores' durable buffers
    # (checkpointed), so a resumed crawl reports the FULL history
    buf_tables = [t for c in cores for t in c._launch_buf]
    if buf_tables:
        launch_log = pa.concat_tables(buf_tables)
        idx = pa.compute.sort_indices(
            launch_log,
            sort_keys=[("wave", "ascending"), ("part_id", "ascending"), ("seq", "ascending")],
        )
        launch_log = launch_log.take(idx)
    else:
        launch_log = pa.table({"url": pa.array([], pa.string())})
    metrics["launched"] = launch_log.num_rows  # full history incl. resume
    url_seen = sorted(
        (u, uh)
        for c in cores
        for u, uh in zip(c._seen_url, c._seen_uh)
    )
    return {
        "metrics": metrics,
        "launch_log": launch_log,
        "url_seen": [(uh, u) for u, uh in url_seen],
        "docs_dir": os.path.join(out_dir, "docs"),
    }
