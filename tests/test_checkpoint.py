"""Checkpoint/resume: a killed run resumed from per-partition checkpoints
must produce exactly the same crawl as an uninterrupted run
(north_rule: "resumable from checkpoint with per-partition lineage")."""

import json
import os
from dataclasses import replace

from open_source_search_engine_ray.pipelines.crawl import run_crawl
from open_source_search_engine_ray.sources.synthweb import WebConfig
from open_source_search_engine_ray.state.frontier import CrawlConfig

WEB = WebConfig(n_hosts=18, n_hubs=2, hub_pages=8, max_pages=5)
CFG = CrawlConfig(num_partitions=2, horizon_ms=400_000, fetch_concurrency=2)


def test_kill_resume_equals_uninterrupted(tmp_path, ray_session):
    truth = run_crawl(WEB, CFG, str(tmp_path / "truth"), engine="ray")
    assert truth.metrics["launched"] > 10

    out = str(tmp_path / "resumable")
    # run with checkpoints every 4 waves, "die" after 8 waves
    partial = run_crawl(
        WEB,
        replace(CFG, stop_after_waves=8),
        out,
        engine="ray",
        checkpoint_every=4,
    )
    assert partial.metrics["launched"] < truth.metrics["launched"]
    man = json.load(open(os.path.join(out, "checkpoints", "MANIFEST.json")))
    assert man["partitions"] == CFG.num_partitions
    assert man["wave"] >= 4

    resumed = run_crawl(WEB, CFG, out, engine="ray", resume=True)
    assert resumed.metrics == truth.metrics
    # launch log: the resumed run replays waves ck..8 (they were after the
    # checkpoint), so compare the deduplicated final ordering
    t = truth.launch_log.to_pylist()
    r = resumed.launch_log.to_pylist()
    t_key = [(x["wave"], x["part_id"], x["seq"], x["uh48"]) for x in t]
    r_key = [(x["wave"], x["part_id"], x["seq"], x["uh48"]) for x in r]
    assert t_key == r_key
    assert truth.url_seen == resumed.url_seen
    assert truth.fetch_log == resumed.fetch_log
    # docs identical (post-checkpoint partial waves were cleaned up)
    td, rd = truth.docs_table(), resumed.docs_table()
    assert td["doc_id"].to_pylist() == rd["doc_id"].to_pylist()
    assert td["spans"].to_pylist() == rd["spans"].to_pylist()


def test_kill_on_non_checkpoint_wave_resumes_exactly(tmp_path, ray_session):
    """Die on a wave that is NOT a checkpoint multiple: the in-flight
    route-back payloads pended for the next schedule are lost with the
    process (as in a real kill), and resume must replay from the last
    checkpoint to the identical final crawl."""
    truth = run_crawl(WEB, CFG, str(tmp_path / "truth"), engine="ray")
    out = str(tmp_path / "resumable")
    partial = run_crawl(
        WEB,
        replace(CFG, stop_after_waves=7),
        out,
        engine="ray",
        checkpoint_every=3,  # last checkpoint at wave 6, death at 7
    )
    assert partial.metrics["launched"] < truth.metrics["launched"]
    resumed = run_crawl(WEB, CFG, out, engine="ray", resume=True)
    assert resumed.metrics == truth.metrics
    assert truth.url_seen == resumed.url_seen
    assert truth.fetch_log == resumed.fetch_log
    t = truth.launch_log.to_pylist()
    r = resumed.launch_log.to_pylist()
    assert [(x["wave"], x["part_id"], x["seq"], x["uh48"]) for x in t] == [
        (x["wave"], x["part_id"], x["seq"], x["uh48"]) for x in r
    ]


def test_legacy_checkpoint_raises_versioned_error():
    """A pre-columnar (dict-based) checkpoint blob must fail resume with
    a clear versioned message, not a KeyError mid-restore."""
    import pickle

    import pytest

    from open_source_search_engine_ray.state.frontier import FrontierCore

    legacy = pickle.dumps({"part_id": 0, "requests": {}, "replies": {}})
    with pytest.raises(RuntimeError, match="pre-columnar"):
        FrontierCore.from_checkpoint_bytes(legacy)
