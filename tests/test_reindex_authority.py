"""Docid-based query reindex (reference PageReindex.cpp:320-395) and
the tagdb-sourced ``hasauthorityinlink`` predicate
(XmlDoc.cpp:6553-6578; Spider.cpp:2270-2276)."""

import json
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq

from open_source_search_engine_ray.functions.gbhash import probable_docid_batch
from open_source_search_engine_ray.functions.urlfilter import UrlFilterRule
from open_source_search_engine_ray.stages.canonicalize import (
    make_reindex_request_cols,
    make_request_columns,
)
from open_source_search_engine_ray.state.frontier import CrawlConfig, FrontierCore


def _request_cols(urls, hosts):
    return make_request_columns(
        urls, {h: 1000 + i for i, h in enumerate(sorted(set(hosts)))}
    )


def _exprs(core):
    rows = np.arange(core.store.n)
    _, ufn = core._eval_filters(rows, 0)
    return {
        core.store.url[r]: core.prog.rules[int(ufn[i])].expression
        for i, r in enumerate(rows)
    }


AUTH_RULES = (
    UrlFilterRule("hasauthorityinlink", 90, 1.0),
    UrlFilterRule("default", 10, 30.0),
)
URLS = ["http://auth.test/p1.html", "http://www.plain.test/p1.html"]
HOSTS = ["auth.test", "www.plain.test"]


def test_authority_inlink_from_tag_table():
    """Hosts/domains in the authority table (tagdb authorityinlink
    stand-in) match the predicate; others fall through."""
    cfg = CrawlConfig(num_partitions=1, rules=AUTH_RULES, authority_sites=("auth.test",))
    core = FrontierCore(0, cfg)
    core.add_requests(_request_cols(URLS, HOSTS))
    e = _exprs(core)
    assert e["http://auth.test/p1.html"] == "hasauthorityinlink"
    assert e["http://www.plain.test/p1.html"] == "default"
    # domain-level entries cover subdomains (tagdb tags are per site)
    cfg2 = CrawlConfig(
        num_partitions=1, rules=AUTH_RULES, authority_sites=("plain.test",)
    )
    core2 = FrontierCore(0, cfg2)
    core2.add_requests(_request_cols(URLS, HOSTS))
    e2 = _exprs(core2)
    assert e2["http://www.plain.test/p1.html"] == "hasauthorityinlink"
    assert e2["http://auth.test/p1.html"] == "default"


def test_authority_inlink_validity_gate():
    """With no tagdb configured the validity gate keeps the rule
    unmatched — matching the reference when no tag rec exists."""
    cfg = CrawlConfig(num_partitions=1, rules=AUTH_RULES)
    core = FrontierCore(0, cfg)
    core.add_requests(_request_cols(URLS, HOSTS))
    assert set(_exprs(core).values()) == {"default"}


def test_authority_flag_survives_checkpoint():
    cfg = CrawlConfig(num_partitions=1, rules=AUTH_RULES, authority_sites=("auth.test",))
    core = FrontierCore(0, cfg)
    core.add_requests(_request_cols(URLS, HOSTS))
    core2 = FrontierCore.from_checkpoint_bytes(core.checkpoint_bytes({}))
    assert _exprs(core2) == _exprs(core)


def test_make_reindex_request_cols_fake_ip_scheme():
    urls = [f"http://h{i:03d}.test/p{i}.html" for i in range(300)]
    cols = make_reindex_request_cols(urls, added_time=42)
    assert cols["is_reindex"].all() and cols["fake_first_ip"].all()
    assert not cols["is_injecting"].any() and not cols["is_addurl"].any()
    assert (cols["hop_count"] == -1).all()  # PageReindex.cpp:378
    assert (cols["added_time"] == 42).all()
    # reindex flavor: bits 6-13 of the docid, 0→1 ⇒ 1..255
    fip = cols["first_ip"]
    assert fip.min() >= 1 and fip.max() <= 255
    dids = probable_docid_batch(list(cols["url"]))
    expect = (dids & np.uint64(0xFFFF)) >> np.uint64(6) & np.uint64(0xFF)
    expect = np.where(expect == 0, 1, expect).astype(np.int64)
    assert (fip == expect).all()
    # delete flavor: full low 16 bits (more random distribution)
    cols_d = make_reindex_request_cols(urls, force_delete=True)
    expect_d = (dids & np.uint64(0xFFFF)).astype(np.int64)
    expect_d = np.where(expect_d == 0, 1, expect_d)
    assert (cols_d["first_ip"] == expect_d).all()
    # duplicate docids collapse (PageReindex's dt table)
    cols2 = make_reindex_request_cols(urls + urls)
    assert len(cols2["url"]) == len(urls)


def _run_cli(*argv, timeout=240):
    r = subprocess.run(
        [sys.executable, "-m", "open_source_search_engine_ray.cli", *argv],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_reindex_then_resume_respiders(tmp_path):
    """e2e: crawl → query-reindex docs by URL substring → resume →
    the matched URLs are respidered (appear in the launch log again)."""
    out = str(tmp_path / "reidx")
    _run_cli(
        "--num-cpus", "4", "crawl", "--out", out, "--hosts", "12",
        "--max-pages", "3", "--partitions", "2", "--checkpoint-every", "2",
    )
    first = pq.read_table(f"{out}/launch_log.parquet").to_pandas()
    target = [u for u in first["url"] if "/p1.html" in u]
    assert target, "fixture crawl should have spidered some /p1.html pages"
    rj = _run_cli("reindex", "--out", out, "--contains", "/p1.html")
    assert rj["matched_docs"] >= 1 and rj["admitted"] >= 1
    _run_cli(
        "--num-cpus", "4", "crawl", "--out", out, "--hosts", "12",
        "--max-pages", "3", "--partitions", "2", "--checkpoint-every", "2",
        "--resume",
    )
    log = pq.read_table(f"{out}/launch_log.parquet").to_pandas()
    counts = log[log["url"].str.contains("/p1.html")]["url"].value_counts()
    # every previously indexed /p1.html doc was spidered a second time
    assert (counts >= 2).any(), counts
