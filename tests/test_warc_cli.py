"""WARC ingestion round-trip + CLI surface."""

import json
import subprocess
import sys

from open_source_search_engine_ray.sources.synthweb import (
    SynthWeb,
    WebConfig,
    render_html,
)
from open_source_search_engine_ray.sources.warc import (
    parse_warc_bytes,
    warc_to_documents,
    write_warc,
)


def test_warc_roundtrip(tmp_path, ray_session):
    web = SynthWeb(WebConfig(n_hosts=6))
    records = [
        {"url": web.page_url(i, p), "html": render_html(web.page_spans(i, p))}
        for i, p in web.iter_pages()
    ]
    path = str(tmp_path / "corpus.warc.gz")
    write_warc(records, path)
    # raw parse
    with open(path, "rb") as f:
        parsed = list(parse_warc_bytes(f.read()))
    assert len(parsed) == len(records)
    assert all(r["http_status"] == 200 for r in parsed)
    # ray pipeline → documents with span equality
    docs = warc_to_documents([path]).to_pandas().sort_values("doc_id")
    assert len(docs) == len(records)
    for r in docs.to_dict("records"):
        loc = web.url_to_page(r["doc_id"])
        assert [dict(s) for s in r["spans"]] == web.page_spans(*loc)


def test_cli_crawl_and_dump(tmp_path):
    out = str(tmp_path / "cliout")
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "open_source_search_engine_ray.cli",
            "--num-cpus",
            "4",
            "crawl",
            "--out",
            out,
            "--hosts",
            "15",
            "--max-pages",
            "4",
            "--partitions",
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["metrics"]["launched"] > 5

    d = subprocess.run(
        [
            sys.executable,
            "-m",
            "open_source_search_engine_ray.cli",
            "dump",
            "--out",
            out,
            "launches",
            "--limit",
            "3",
        ],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/root/repo",
    )
    assert d.returncode == 0, d.stderr[-2000:]
    lines = [json.loads(x) for x in d.stdout.strip().splitlines()]
    assert len(lines) == 3 and "url" in lines[0]

    m = subprocess.run(
        [
            sys.executable,
            "-m",
            "open_source_search_engine_ray.cli",
            "dump",
            "--out",
            out,
            "metrics",
        ],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/root/repo",
    )
    assert json.loads(m.stdout)["launched"] == info["metrics"]["launched"]


def test_cli_inject_then_resume(tmp_path):
    """inject persists requests into the checkpoints; crawl --resume
    schedules them (reference: PageAddUrl → setFromAddUrl flow)."""
    out = str(tmp_path / "injout")

    def run(*argv, timeout=240):
        r = subprocess.run(
            [sys.executable, "-m", "open_source_search_engine_ray.cli", *argv],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run(
        "--num-cpus", "4", "crawl", "--out", out, "--hosts", "12",
        "--max-pages", "3", "--partitions", "2", "--checkpoint-every", "2",
    )
    # p99 never exists (max_pages=3) so no crawl link can have seen it
    url = "http://www.h0001.test/p99.html"
    inj = run("inject", "--out", out, "--hosts", "12", url)
    assert inj["admitted"] == 1
    info = run(
        "--num-cpus", "4", "crawl", "--out", out, "--hosts", "12",
        "--max-pages", "3", "--partitions", "2", "--checkpoint-every", "2",
        "--resume",
    )
    assert info["metrics"]["launched"] >= 1
    import pyarrow.parquet as pq

    launches = pq.read_table(f"{out}/launch_log.parquet")
    assert url in set(launches["url"].to_pylist())


def test_cli_compact_frontier_log(tmp_path):
    """`compact` exports the live frontier from checkpoints as an
    append-only log parquet and runs the dedupSpiderdbList merge over
    it (Rdb dump/merge surface)."""
    out = str(tmp_path / "cmpout")

    def run(*argv, timeout=240):
        r = subprocess.run(
            [sys.executable, "-m", "open_source_search_engine_ray.cli", *argv],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run(
        "--num-cpus", "4", "crawl", "--out", out, "--hosts", "12",
        "--max-pages", "3", "--partitions", "2", "--checkpoint-every", "2",
    )
    dest = str(tmp_path / "merged")
    info = run("--num-cpus", "4", "compact", "--out", out, "--dest", dest)
    assert info["log_rows"] > 0
    assert 0 < info["compacted_rows"] <= info["log_rows"]
    import pyarrow.parquet as pq

    comp = pq.read_table(info["compacted"]).to_pandas()
    # merge invariant: at most one (newest) reply per uh48 survives
    reps = comp[comp["rec"] == "reply"]
    assert reps["uh48"].is_unique
    # requests kept their URLs; replies are uh48-keyed
    assert (comp[comp["rec"] == "request"]["url"] != "").all()
