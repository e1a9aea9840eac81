"""The crawl engine: a discrete-virtual-time wave loop over Ray Data.

Topology per wave (reference lifecycle §3 of SURVEY.md):

    FrontierActor.schedule(now)  --launch batches-->  ray.data.from_arrow
        → map_batches(FetchStage)   (robots gate + download)
        → map_batches(ParseStage)   (spans, reply, outlinks)
        → map_batches(route_back)   (docs → partitioned parquet;
                                     replies/requests → owning FrontierActor)

Virtual time: the driver advances ``now`` to the minimum next-event time
across partitions (the waiting-tree minimum, SpiderColl.cpp:1309-1403);
politeness intervals are enforced in virtual ms so the crawl ordering is
deterministic and reproducible against the sequential oracle
(``engine="local"``), which runs the *same* FrontierCore and stage code
single-threaded.  A real-time deployment sets ``now = wall clock`` and
the same code paces real fetches.

Scale design: one FrontierActor per partition owns each politeness
domain exclusively (hash(first_ip) % P shuffle key); fetch/parse are
horizontal map_batches stages; documents are written one directory per
wave (resumable); frontier state checkpoints per partition with lineage
(wave id) so a killed run resumes from the last completed wave.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..sources.synthweb import SynthWeb, WebConfig, get_web
from ..stages.canonicalize import make_request_columns, split_by_partition
from ..stages.fetch import (
    RECORD_SCHEMA,
    FetchStage,
    ParseStage,
    fetch_batch,
    parse_batch,
)
from ..state.frontier import (
    INF,
    LAUNCH_SCHEMA,
    REPLY_COLS,
    REQUEST_COLS,
    CrawlConfig,
    FrontierCore,
    transit_ck32,
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("uh48", pa.uint64()),
        ("spans", RECORD_SCHEMA.field("spans").type),
        ("wave", pa.int64()),
    ]
)


def _table_to_cols(t: pa.Table, names) -> dict:
    return {c: t[c].to_numpy(zero_copy_only=False) for c in names}


# -- Arrow IPC transport ----------------------------------------------------
# Once any Ray Data pipeline has executed, Ray registers custom Arrow
# serializers process-wide; we observed row-level corruption of pa.Tables
# crossing task/actor boundaries afterwards (uh48[i] no longer matching
# url[i]).  All engine-internal table transfers therefore go as Arrow IPC
# bytes, which serialize as plain buffers and are immune.


def table_to_ipc(t: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def ipc_to_table(b: bytes) -> pa.Table:
    return pa.ipc.open_stream(pa.py_buffer(b)).read_all()


def _content_token(kind: str, t: pa.Table) -> str:
    """Deterministic batch token: parse output is deterministic, so a
    retried task regenerates the same token and the actor (or the doc
    writer) applies it exactly once."""
    import hashlib

    h = hashlib.md5(kind.encode())
    for col in ("wave", "uh48", "added_time", "parent_ip", "hop_count"):
        if col in t.column_names:
            h.update(np.ascontiguousarray(t[col].to_numpy()).tobytes())
    return h.hexdigest()


def _write_doc_table(t: pa.Table, out_dir: str, wave_hint: str):
    d = os.path.join(out_dir, "docs", f"wave={wave_hint}")
    os.makedirs(d, exist_ok=True)
    # content-derived filename → idempotent under Ray task retries
    name = f"part-{_content_token('doc', t)}.parquet"
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(d, name))


def _split_records(batch: pa.Table):
    rec = batch["rec"].to_numpy(zero_copy_only=False)
    docs = batch.filter(pa.array(rec == "doc")).select(["doc_id", "uh48", "spans", "wave"])
    reqs = batch.filter(pa.array(rec == "request"))
    reps = batch.filter(pa.array(rec == "reply"))
    return docs, reqs, reps


def _group_parts(t: pa.Table):
    parts = t["part"].to_numpy()
    for p in np.unique(parts):
        yield int(p), t.filter(pa.array(parts == p))


def route_back_payloads(batch: pa.Table, out_dir: str) -> dict:
    """Persist docs (idempotent content-named file write) and build the
    per-partition request/reply payload blobs (reference:
    Msg4::addMetaList scatter, Msg4.cpp:418-423).  Returns
    {partition: pickled payload} for the caller to deliver."""
    import pickle

    docs, reqs, reps = _split_records(batch)
    if docs.num_rows:
        _write_doc_table(docs, out_dir, str(docs["wave"][0].as_py()))
    payloads: dict = {}
    for p, sub in _group_parts(reqs):
        cols = _table_to_cols(sub, REQUEST_COLS)
        verify_request_cols(cols, "routeback-out")
        # full hash64b gate passed above; the actor-in gate validates the
        # plasma/pickle transit leg with this cheap checksum instead
        cols["ck32"] = transit_ck32(cols["url"], cols["uh48"])
        payloads.setdefault(int(p), {})["req_cols"] = cols
        payloads[int(p)]["req_token"] = _content_token("req", sub)
    for p, sub in _group_parts(reps):
        payloads.setdefault(int(p), {})["rep_cols"] = _table_to_cols(sub, REPLY_COLS)
        payloads[int(p)]["rep_token"] = _content_token("rep", sub)
    return {p: pickle.dumps(pay) for p, pay in payloads.items()}


def route_back_table(batch: pa.Table, actors, out_dir: str) -> pa.Table:
    """Dataset-path route-back: persist docs and apply frontier records
    to their owning partition actors in-stage.  Idempotent under Ray
    task retries via content-derived tokens."""
    import ray

    n_docs = int((batch["rec"].to_numpy(zero_copy_only=False) == "doc").sum())
    n_reqs = int((batch["rec"].to_numpy(zero_copy_only=False) == "request").sum())
    n_reps = batch.num_rows - n_docs - n_reqs
    blobs = route_back_payloads(batch, out_dir)
    futs = [actors[p].apply_blob.remote(blob) for p, blob in blobs.items()]
    if futs:
        ray.get(futs)
    return pa.table(
        {
            "docs": pa.array([n_docs], pa.int64()),
            "requests": pa.array([n_reqs], pa.int64()),
            "replies": pa.array([n_reps], pa.int64()),
            "touched": pa.array([sorted(blobs)], pa.list_(pa.int32())),
        }
    )


class _RouteBack:
    def __init__(self, actors, out_dir: str):
        self.actors = actors
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        return route_back_table(batch, self.actors, self.out_dir)


def _verify_launch_table(table: pa.Table, where: str = "task") -> None:
    """Integrity gate: uh48 must equal hash64b(url)&48bits for every row.
    Catches any buffer corruption in transit at the point of occurrence
    instead of as a silent crawl divergence."""
    from ..functions.gbhash import uh48_batch

    urls = table["url"].to_pylist()
    want = uh48_batch(urls)
    got = table["uh48"].to_numpy()
    if not (want == got).all():
        import os

        bad = int(np.nonzero(want != got)[0][0])
        dump = f"/tmp/corrupt-{where}-{os.getpid()}.parquet"
        try:
            pq.write_table(table, dump)
        except Exception:
            dump = "<dump failed>"
        raise RuntimeError(
            f"launch-table corruption at {where}: row {bad}/{table.num_rows} "
            f"url={urls[bad]!r} uh48={int(got[bad])} recomputed={int(want[bad])} "
            f"dump={dump}"
        )


def verify_request_cols(cols: dict, where: str) -> None:
    """Same integrity gate for REQUEST_COLS numpy dicts entering actors."""
    from ..functions.gbhash import uh48_batch

    want = uh48_batch(list(cols["url"]))
    got = np.asarray(cols["uh48"], dtype=np.uint64)
    if not (want == got).all():
        bad = int(np.nonzero(want != got)[0][0])
        raise RuntimeError(
            f"request-cols corruption at {where}: row {bad}/{len(got)} "
            f"url={cols['url'][bad]!r} uh48={int(got[bad])} recomputed={int(want[bad])}"
        )


def _wave_task_body(table_ipc, web_cfg, user_agent, num_partitions, out_dir):
    """Small-wave fast path: fetch+parse in one Ray task.  A
    politeness-bound crawl tail produces many waves of a handful of
    URLs; a full Dataset per wave costs more than the work, so waves
    under ``SMALL_WAVE_ROWS`` run as plain tasks (same cached stage
    code, same idempotency tokens — results are identical).  The table
    arrives as Arrow IPC bytes (see table_to_ipc).

    Returns ``num_partitions + 1`` objects: a small meta dict, then one
    route-back payload blob per partition (None when untouched).  The
    driver pends only the ObjectRefs and piggybacks them onto each
    partition's next schedule RPC; the actor fetches the bytes straight
    from the object store.  This keeps chunk tasks from blocking a CPU
    slot on actor RPCs (measured ~35% of task occupancy), keeps
    route-back bytes out of the single-threaded driver, and stays
    fault-tolerant: task-return objects are driver-owned and lineage-
    reconstructable, and applies are idempotent via content tokens."""
    import time as _time

    from ..stages.fetch import _cached_fetch, _cached_parse

    t0 = _time.perf_counter()
    table = ipc_to_table(table_ipc)
    _verify_launch_table(table, "task")
    recs = _cached_parse(web_cfg, num_partitions)(
        _cached_fetch(web_cfg, user_agent)(table)
    )
    blobs = route_back_payloads(recs, out_dir)
    meta = {"parts": sorted(blobs), "compute_s": _time.perf_counter() - t0}
    return tuple([meta] + [blobs.get(p) for p in range(num_partitions)])


# smallest per-task chunk in the wave fan-out.  Re-measured after the
# route-back applies moved to the driver (chunk tasks no longer block on
# actor RPCs): task_compute CPU-seconds on the headline crawl were 322 s
# at floor 2, 184 s at 64, 156 s at 128 — the per-chunk fixed costs
# (IPC decode, verify gate, sub-batch Arrow assembly) dominate tiny
# chunks, and politeness-bound tail waves are latency-bound anyway.
# 64 keeps medium waves parallel at the same wall time as 128.
CHUNK_MIN_ROWS = 64

# waves at or below this row count run fetch+parse INLINE on the driver:
# a politeness-tail wave of a handful of URLs pays a ~20-40 ms Ray task
# round trip for ~1 ms/URL of compute, and the tail is latency-bound —
# its wall time IS the crawl's serial floor.  The inline path reuses the
# same cached stages and route_back_payloads (same tokens, identical
# results); payloads ride the existing _pending fusion into the next
# schedule RPC, so a tiny wave costs one schedule RPC and nothing else.
INLINE_WAVE_ROWS = 48

SMALL_WAVE_ROWS = 1 << 20  # waves up to this size use chunked raw tasks;
# larger waves go through a full Ray Data pipeline (streaming executor +
# backpressure + spill matter only once a single wave outgrows memory).
# The chunk path is itself memory-bounded — launch slices and route-back
# payloads live in the (spillable) object store, the driver holds only
# refs — so the Dataset path is reserved for waves whose ROW COUNT alone
# is plasma-scale.  Measured: an 86k-row wave ran 13x faster chunked,
# and a Dataset execution's lingering executor state also depresses
# subsequent raw-task waves 20-40% (see bench.py note).



@dataclass
class CrawlResult:
    """Crawl outputs.  The full crawl history (launch log, URL-seen) lives
    in per-partition parquet segments under ``out_dir/frontier`` — the
    actors stream it there during the crawl, only hot scheduling state is
    in actor RAM.  ``finalize()`` therefore returns HANDLES, not data:

    * ``launch_log_ds()`` / ``url_seen_ds()`` — ``ray.data.read_parquet``
      over the segment files; the 100-TB consumption path (streams,
      never lands on the driver).
    * ``launch_log`` / ``url_seen`` — driver-side materialized
      properties (concat + global sort).  Test / small-crawl convenience
      only; lazy and cached, so a caller that never touches them pays
      nothing.

    ``fetch_log`` is derived from the actors' hot latest-reply state and
    streams to per-partition ``fetchlog-`` segments at finalize like the
    other histories; ``fetch_log_ds()`` is the scale consumption path,
    the ``fetch_log`` property the driver-side sorted-tuples convenience
    (tests / small crawls).  ``fetch_log_eager`` is only populated by
    log_dir-less unit cores."""

    fetch_log_eager: list | None
    metrics: dict
    docs_dir: str
    waves: int

    @property
    def frontier_dir(self) -> str:
        return os.path.join(self.docs_dir, "frontier")

    def _segment_paths(self, prefix: str) -> list:
        paths = []
        fdir = self.frontier_dir
        if os.path.isdir(fdir):
            for part in sorted(os.listdir(fdir)):
                d = os.path.join(fdir, part)
                if not os.path.isdir(d):
                    continue
                paths.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.startswith(prefix)
                )
        return paths

    def launch_log_ds(self):
        """Launch history as a streaming ``ray.data.Dataset`` (unsorted;
        rows carry (wave, part_id, seq) for a downstream ``sort``)."""
        import ray.data as rd

        paths = self._segment_paths("launch-")
        if not paths:
            return rd.from_arrow(LAUNCH_SCHEMA.empty_table())
        return rd.read_parquet(paths)

    def fetch_log_ds(self):
        """Latest-reply snapshot (one row per crawled uh48) as a
        streaming ``ray.data.Dataset``."""
        import ray.data as rd

        paths = self._segment_paths("fetchlog-")
        if not paths:
            return rd.from_arrow(
                pa.table(
                    {
                        "uh48": pa.array([], pa.uint64()),
                        "spidered_time": pa.array([], pa.int64()),
                        "http_status": pa.array([], pa.int64()),
                        "err_code": pa.array([], pa.int64()),
                        "err_count": pa.array([], pa.int64()),
                        "crawl_delay_ms": pa.array([], pa.int64()),
                    }
                )
            )
        return rd.read_parquet(paths)

    @property
    def fetch_log(self) -> list:
        log = self.__dict__.get("_fetch_log")
        if log is None:
            if self.fetch_log_eager is not None:
                log = sorted(self.fetch_log_eager)
            else:
                log = []
                for p in self._segment_paths("fetchlog-"):
                    t = pq.read_table(p)
                    log.extend(
                        zip(*(t[c].to_pylist() for c in t.column_names))
                    )
                log = sorted(log)
            self.__dict__["_fetch_log"] = log
        return log

    def url_seen_ds(self):
        """URL-seen pairs (uh48, url) as a streaming ``ray.data.Dataset``."""
        import ray.data as rd

        paths = self._segment_paths("seen-")
        if not paths:
            return rd.from_arrow(
                pa.table({"uh48": pa.array([], pa.uint64()), "url": pa.array([], pa.string())})
            )
        return rd.read_parquet(paths)

    @property
    def launch_log(self) -> pa.Table:
        t = self.__dict__.get("_launch_log")
        if t is None:
            tbls = [pq.read_table(p) for p in self._segment_paths("launch-")]
            t = pa.concat_tables(tbls) if tbls else LAUNCH_SCHEMA.empty_table()
            if t.num_rows:
                idx = pa.compute.sort_indices(
                    t,
                    sort_keys=[
                        ("wave", "ascending"),
                        ("part_id", "ascending"),
                        ("seq", "ascending"),
                    ],
                )
                t = t.take(idx)
            self.__dict__["_launch_log"] = t
        return t

    @property
    def url_seen(self) -> list:
        pairs = self.__dict__.get("_url_seen")
        if pairs is None:
            pairs = []
            for p in self._segment_paths("seen-"):
                t = pq.read_table(p)
                pairs.extend(zip(t["uh48"].to_pylist(), t["url"].to_pylist()))
            pairs = sorted(pairs)
            self.__dict__["_url_seen"] = pairs
        return pairs

    def docs_table(self) -> pa.Table:
        import pyarrow.dataset as pads

        d = os.path.join(self.docs_dir, "docs")
        if not os.path.isdir(d):
            return DOC_SCHEMA.empty_table()
        t = pads.dataset(d, format="parquet").to_table()
        idx = pa.compute.sort_indices(t, sort_keys=[("doc_id", "ascending")])
        return t.take(idx)


def _merge_results(cores_data, out_dir, waves) -> CrawlResult:
    """Collect the crawl outputs.  Only the metric counters are gathered;
    launch / URL-seen / fetch-log history stays in the parquet segments
    and is exposed through the CrawlResult handles above."""
    eager = None
    if any("fetch_log" in d for d in cores_data):  # log_dir-less cores
        eager = sorted(x for d in cores_data for x in d.get("fetch_log", []))
    metrics: dict = {}
    for d in cores_data:
        for k, v in d["metrics"].items():
            metrics[k] = metrics.get(k, 0) + v
    return CrawlResult(eager, metrics, out_dir, waves)


def seed_columns(web: SynthWeb, host_ip: dict):
    return make_request_columns(web.seeds(), host_ip, hop_count=0, added_time=0, parent_ip=0)


def run_crawl(
    web_cfg: WebConfig,
    cfg: CrawlConfig,
    out_dir: str,
    engine: str = "ray",
    checkpoint_every: int = 0,
    resume: bool = False,
) -> CrawlResult:
    """Run one crawl round.  ``engine="ray"`` = distributed;
    ``engine="local"`` = the sequential oracle (same semantics, no Ray)."""
    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        # a fresh (non-resume) run must not inherit docs/checkpoints from a
        # previous run in the same directory
        import shutil

        for sub in ("docs", "checkpoints", "frontier"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    web = get_web(web_cfg)
    host_ip = {h: int(ip) for h, ip in zip(web.hosts, web.ips)}
    if not cfg.site_list:
        from dataclasses import replace

        cfg = replace(cfg, site_list=tuple(web.site_list()))
    if engine == "ray":
        return _run_ray(web, host_ip, web_cfg, cfg, out_dir, checkpoint_every, resume)
    return _run_local(web, host_ip, web_cfg, cfg, out_dir)


# ---------------------------------------------------------------------------
# distributed engine
# ---------------------------------------------------------------------------


def _ckpt_path(out_dir: str, p: int) -> str:
    return os.path.join(out_dir, "checkpoints", f"part-{p:05d}.ckpt")


_WAVE_TASK = None


def _get_wave_task(ray):
    global _WAVE_TASK
    if _WAVE_TASK is None:
        _WAVE_TASK = ray.remote(num_cpus=1)(_wave_task_body)
    return _WAVE_TASK


def _seed_task_body(raw_urls, host_ip, P):
    """Canonicalize+hash a seed chunk into per-partition request blobs
    (the cluster-side form of seed_columns for big seed lists)."""
    import pickle

    from ..stages.canonicalize import make_request_columns, split_by_partition

    cols = make_request_columns(
        raw_urls, host_ip, hop_count=0, added_time=0, parent_ip=0
    )
    return {int(p): pickle.dumps(sub) for p, sub in split_by_partition(cols, P)}


#: seed lists at least this long canonicalize on the cluster instead of
#: the driver (tests patch this down to force the parallel path)
SEED_TASK_MIN = 20_000

_SEED_TASK = None


def _get_seed_task(ray):
    global _SEED_TASK
    if _SEED_TASK is None:
        _SEED_TASK = ray.remote(num_cpus=1)(_seed_task_body)
    return _SEED_TASK


class _RayCrawlCtx:
    """One collection's distributed crawl, step-able wave by wave so
    ``run_multi_crawl`` can round-robin collections (reference:
    SpiderLoop's getNextCollToSpider rotation).  ``_run_ray`` drives a
    single instance to completion — behavior is identical to the
    previous monolithic loop."""

    def __init__(self, web, host_ip, web_cfg, cfg, out_dir, checkpoint_every, resume):
        import ray
        import time as _time

        self.ray = ray
        self.web_cfg = web_cfg
        self.cfg = cfg
        self.out_dir = out_dir
        self.checkpoint_every = checkpoint_every
        self._wave_task = _get_wave_task(ray)
        FrontierActor = ray.remote(num_cpus=0.01)(FrontierCore)
        P = self.P = cfg.num_partitions
        manifest_path = os.path.join(out_dir, "checkpoints", "MANIFEST.json")
        resumed = False
        ck_wave = 0
        ck_now = 0
        if resume and os.path.exists(manifest_path):
            RestoredActor = ray.remote(num_cpus=0.01)(_RestoredFrontier)
            blobs = []
            for p in range(P):
                with open(_ckpt_path(out_dir, p), "rb") as f:
                    blobs.append(f.read())
            self.actors = [RestoredActor.remote(blob) for blob in blobs]
            with open(manifest_path) as f:
                manifest = json.load(f)
            ck_wave = manifest["wave"]
            # restore the driver's virtual clock too — `now` may be ahead
            # of the minimum next-event (now = max(now, nxt+window)), and
            # an exact resume must not re-launch at earlier virtual times
            ck_now = manifest.get("now", 0)
            # drop doc partitions written after the checkpoint (partial
            # waves); completed waves carry doc wave fields < ck_wave
            import shutil

            docs_root = os.path.join(out_dir, "docs")
            if os.path.isdir(docs_root):
                for d in os.listdir(docs_root):
                    if d.startswith("wave=") and int(d.split("=")[1]) >= ck_wave:
                        shutil.rmtree(os.path.join(docs_root, d))
            resumed = True
        else:
            log_dir = os.path.join(out_dir, "frontier")
            self.actors = [FrontierActor.remote(p, cfg, log_dir) for p in range(P)]
        if not resumed:
            import pickle

            raw_seeds = web.seeds()
            if len(raw_seeds) >= SEED_TASK_MIN:
                # big seed lists canonicalize+hash on the cluster, not
                # the driver (at 10^10 URLs the seed list is a dataset;
                # admission is commutative — see urlseen docstring — so
                # per-chunk delivery order is free)
                seed_task = _get_seed_task(ray)
                ip_ref = ray.put(host_ip)
                nchunk = max(8, min(32, self.ncpu if hasattr(self, "ncpu") else 32))
                step = -(-len(raw_seeds) // nchunk)
                chunk_futs = [
                    seed_task.remote(raw_seeds[o : o + step], ip_ref, P)
                    for o in range(0, len(raw_seeds), step)
                ]
                admits = []
                for blobs in ray.get(chunk_futs):
                    admits.extend(
                        self.actors[p].add_requests_blob.remote(b)
                        for p, b in blobs.items()
                    )
                ray.get(admits)
            else:
                cols = seed_columns(web, host_ip)
                ray.get(
                    [
                        self.actors[p].add_requests_blob.remote(pickle.dumps(sub))
                        for p, sub in split_by_partition(cols, P)
                    ]
                )
        self.now = ck_now if resumed else 0
        self.waves = ck_wave if resumed else 0
        self.stage_kw = dict(batch_format="pyarrow", batch_size=cfg.fetch_batch_size)
        # driver-tracked next-event per partition: refreshed from each
        # schedule_ipc response and from the wave tasks' touched-partition
        # reports — no separate poll round per wave
        self.events = {
            p: ev
            for p, ev in enumerate(
                ray.get([a.next_event_ms.remote() for a in self.actors])
            )
        }
        self.ncpu = int(ray.cluster_resources().get("CPU", 8))
        self._wave_trace: list = []  # (launch rows, wall s) per wave
        self._pending: dict = {}  # partition -> [payload blobs] awaiting delivery
        self._apply_acks: list = []  # in-flight eager apply_pending futures
        # task_compute is CPU-seconds summed over chunk tasks
        # (fetch+parse); a_apply/a_scan are actor-side seconds from the
        # schedule RPC; schedule/prep/tasks are driver wall time
        self.timing = {
            "schedule": 0.0,
            "prep": 0.0,
            "tasks": 0.0,
            "task_compute": 0.0,
            "a_apply": 0.0,
            "a_scan": 0.0,
        }
        self.t_start = _time.monotonic()
        self.done = False

    def step(self) -> bool:
        """Run one wave; False once the frontier is drained (or the
        stop_after_waves test hook fired)."""
        import time as _time

        import ray.data as rd

        if self.done:
            return False
        _wave_t0 = _time.perf_counter()
        ray, cfg, P = self.ray, self.cfg, self.P
        nxt = min(self.events.values())
        if nxt >= INF or nxt > cfg.horizon_ms:
            self.done = True
            return False
        if cfg.real_clock:
            # pace against the wall: sleep until the next event is due,
            # then schedule at the actual elapsed wall ms (politeness
            # gaps become real delays)
            wall = int((_time.monotonic() - self.t_start) * 1000)
            if nxt > wall:
                _time.sleep((nxt - wall) / 1000.0)
            self.now = max(int((_time.monotonic() - self.t_start) * 1000), nxt)
        else:
            self.now = max(self.now, nxt + cfg.wave_window_ms)
        now = self.now
        due = [p for p in range(P) if self.events[p] <= now]
        _buck0 = dict(self.timing)
        _t0 = _time.perf_counter()
        # pending route-backs ride along with the schedule RPC (touched
        # partitions have events==0, so they are always due)
        sched = {
            self.actors[p].schedule_ipc.remote(
                now, self.waves, self._pending.pop(p, None)
            ): p
            for p in due
        }
        self.waves += 1

        def _submit_chunks(t: pa.Table, chunk: int, futs: list):
            for off in range(0, t.num_rows, chunk):
                futs.append(
                    self._wave_task.options(num_returns=P + 1).remote(
                        table_to_ipc(t.slice(off, chunk)),
                        self.web_cfg,
                        cfg.user_agent,
                        P,
                        self.out_dir,
                    )
                )

        # chunked task fan-out with schedule/dispatch overlap: as each
        # partition's scan returns, a BIG launch table (one that alone
        # fills the 4-chunks-per-CPU fan-out at the chunk floor) is
        # sliced and submitted immediately — its fetch work overlaps the
        # remaining partitions' scan+apply RPCs.  Small tables are
        # merged and chunked together once all scans are in (per-table
        # chunking would shatter them into floor-size fragments).  The
        # Dataset path takes over per TABLE when a single partition's
        # wave outgrows the object-store-friendly chunk regime.
        big_rows = 4 * self.ncpu * CHUNK_MIN_ROWS
        futs: list = []
        small_tables = []
        ds_tables = []
        total_rows = 0
        pending_s = list(sched)
        while pending_s:
            done, pending_s = ray.wait(pending_s, num_returns=1)
            p = sched[done[0]]
            blob, ev, stats = ray.get(done[0])
            self.timing["a_apply"] += stats["apply_s"]
            self.timing["a_scan"] += stats["scan_s"]
            self.events[p] = ev
            t = ipc_to_table(blob)
            if not t.num_rows:
                continue
            total_rows += t.num_rows
            if t.num_rows > SMALL_WAVE_ROWS:
                ds_tables.append(t)
            elif t.num_rows >= big_rows:
                _submit_chunks(
                    t, max(CHUNK_MIN_ROWS, -(-t.num_rows // (4 * self.ncpu))), futs
                )
            else:
                small_tables.append(t)
        self.timing["schedule"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        if small_tables:
            merged = pa.concat_tables(small_tables)
            if merged.num_rows <= INLINE_WAVE_ROWS and not futs and not ds_tables:
                # driver-inline tail wave (see INLINE_WAVE_ROWS)
                from ..stages.fetch import _cached_fetch, _cached_parse

                recs = _cached_parse(self.web_cfg, P)(
                    _cached_fetch(self.web_cfg, cfg.user_agent)(merged)
                )
                blobs = route_back_payloads(recs, self.out_dir)
                for p2, blob in blobs.items():
                    self._pending.setdefault(p2, []).append(blob)
                    self.events[p2] = 0  # due next wave (fused apply)
                dt = _time.perf_counter() - _t0
                self.timing["task_compute"] += dt
                self.timing["tasks"] += dt
                _t0 = _time.perf_counter()  # keep "prep" clean of inline time
            else:
                # ~4 chunks per CPU: fine-grained enough that stragglers
                # don't serialize the wave; CHUNK_MIN_ROWS floor measured
                _submit_chunks(
                    merged,
                    max(CHUNK_MIN_ROWS, -(-merged.num_rows // (4 * self.ncpu))),
                    futs,
                )
        self.timing["prep"] += _time.perf_counter() - _t0
        if futs:
            _t0 = _time.perf_counter()
            # no apply barrier: only the tiny meta object is fetched;
            # payload REFS are forwarded EAGERLY — as chunk tasks finish,
            # their per-partition payloads go out via apply_pending in
            # batched flush rounds, so the apply CPU on the frontier
            # actors overlaps the still-running chunk tasks and the next
            # schedule RPC only scans.  Per-caller actor FIFO ordering
            # guarantees every forwarded apply executes before the next
            # wave's schedule_ipc on that actor; applies stay commutative
            # + token-idempotent, so delivery order across tasks is free.
            # Acks are drained lazily (error propagation only).
            meta_of = {refs[0]: refs for refs in futs}
            flush_every = max(1, -(-len(futs) // 4))
            to_flush: dict = {}
            arrived = 0
            pending_m = list(meta_of)
            while pending_m:
                done_m, pending_m = ray.wait(pending_m, num_returns=1)
                refs = meta_of[done_m[0]]
                meta = ray.get(done_m[0])
                for p in meta["parts"]:
                    to_flush.setdefault(p, []).append(refs[1 + p])
                    self.events[p] = 0  # completions/adds re-arm asap
                self.timing["task_compute"] += meta["compute_s"]
                arrived += 1
                if arrived % flush_every == 0 or not pending_m:
                    self._apply_acks.extend(
                        self.actors[p].apply_pending.remote(rr)
                        for p, rr in to_flush.items()
                    )
                    to_flush.clear()
            self.timing["tasks"] += _time.perf_counter() - _t0
            if len(self._apply_acks) > 1024:
                ray.get(self._apply_acks)
                self._apply_acks.clear()
        if ds_tables:
            tables = ds_tables
            ds = rd.from_arrow(tables)
            if cfg.stage_mode == "actors":
                ds = ds.map_batches(
                    FetchStage,
                    fn_constructor_args=(self.web_cfg, cfg.user_agent),
                    concurrency=cfg.fetch_concurrency,
                    num_cpus=1,
                    **self.stage_kw,
                )
                ds = ds.map_batches(
                    ParseStage,
                    fn_constructor_args=(self.web_cfg, P),
                    concurrency=cfg.fetch_concurrency,
                    num_cpus=1,
                    **self.stage_kw,
                )
            else:
                ds = ds.map_batches(
                    fetch_batch,
                    fn_kwargs={"web_cfg": self.web_cfg, "user_agent": cfg.user_agent},
                    **self.stage_kw,
                )
                ds = ds.map_batches(
                    parse_batch,
                    fn_kwargs={"web_cfg": self.web_cfg, "num_partitions": P},
                    **self.stage_kw,
                )
            ds = ds.map_batches(_RouteBack(self.actors, self.out_dir), **self.stage_kw)
            # consume (small counts table) — this is the wave barrier
            ds.take_all()
            # Dataset path: refresh all events (touched parts unknown here)
            self.events = {
                p: ev
                for p, ev in enumerate(
                    ray.get([a.next_event_ms.remote() for a in self.actors])
                )
            }
            # partitions with pended (undelivered) chunk-path payloads
            # must stay due — the refresh reads actor state that does
            # not include them yet
            for p in self._pending:
                self.events[p] = 0
        if self.checkpoint_every and self.waves % self.checkpoint_every == 0:
            # pending route-backs must be in actor state before it is
            # checkpointed (a resume would otherwise lose them)
            self._flush_pending()
            _checkpoint_all(ray, self.actors, self.out_dir, self.waves, now)
        self._wave_trace.append(
            (
                total_rows,
                _time.perf_counter() - _wave_t0,
                {k: self.timing[k] - _buck0[k] for k in self.timing},
            )
        )
        if cfg.stop_after_waves and self.waves >= cfg.stop_after_waves:
            self.done = True  # simulated kill (test hook for resume)
            return False
        return True

    def _flush_pending(self):
        """Deliver any pended route-back payload refs and drain eager-
        apply acks (end of crawl or pre-checkpoint): every apply must be
        in actor state — and any apply error surfaced — before a
        checkpoint or finalize reads it."""
        futs = [
            self.actors[p].apply_pending.remote(refs)
            for p, refs in self._pending.items()
        ]
        self._pending.clear()
        futs.extend(self._apply_acks)
        self._apply_acks = []
        if futs:
            self.ray.get(futs)

    def finalize(self) -> CrawlResult:
        ray = self.ray
        self._flush_pending()
        if os.environ.get("GRAFT_TIMING"):
            eager_apply = sum(
                ray.get([a.get_apply_secs.remote() for a in self.actors])
            )
            print(
                f"[crawl timing] waves={self.waves} "
                + " ".join(f"{k}={v:.2f}s" for k, v in self.timing.items())
                + f" eager_apply={eager_apply:.2f}s"
            )
            tr = sorted(self._wave_trace, key=lambda x: -x[1])
            small = [w for r, w, _ in self._wave_trace if r <= 2048]
            print(
                "[wave trace] top5="
                + " ".join(
                    f"{r}r/{w*1e3:.0f}ms({ ' '.join(f'{k[:4]}={v:.2f}' for k, v in b.items() if v >= 0.01) })"
                    for r, w, b in tr[:5]
                )
                + f" | small(n={len(small)})"
                + (
                    f" mean={sum(small)/len(small)*1e3:.0f}ms"
                    f" max={max(small)*1e3:.0f}ms"
                    if small
                    else ""
                )
            )
        if self.checkpoint_every:
            # final checkpoint: lets `inject` add URLs to the finished
            # crawl and `crawl --resume` continue it
            _checkpoint_all(ray, self.actors, self.out_dir, self.waves, self.now)
        data = ray.get([a.finalize.remote() for a in self.actors])
        for a in self.actors:
            ray.kill(a)
        return _merge_results(data, self.out_dir, self.waves)


def _run_ray(web, host_ip, web_cfg, cfg, out_dir, checkpoint_every, resume):
    ctx = _RayCrawlCtx(web, host_ip, web_cfg, cfg, out_dir, checkpoint_every, resume)
    while ctx.step():
        pass
    return ctx.finalize()


class _RestoredFrontier(FrontierCore):
    def __init__(self, blob: bytes):
        core = FrontierCore.from_checkpoint_bytes(blob)
        self.__dict__.update(core.__dict__)


def _checkpoint_all(ray_mod, actors, out_dir, wave, now=0):
    os.makedirs(os.path.join(out_dir, "checkpoints"), exist_ok=True)
    blobs = ray_mod.get(
        [a.checkpoint_bytes.remote({"wave": wave}) for a in actors]
    )
    for p, blob in enumerate(blobs):
        tmp = _ckpt_path(out_dir, p) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, _ckpt_path(out_dir, p))
    with open(os.path.join(out_dir, "checkpoints", "MANIFEST.json"), "w") as f:
        json.dump({"wave": wave, "now": now, "partitions": len(actors)}, f)


# FrontierCore needs result-collection methods; attach here to keep the
# state module Ray-agnostic.
def _finalize(self) -> dict:
    """Flush durable log segments (launch log, URL-seen, fetch-log
    snapshot); return only the metric counters.  The fetch log streams
    to a per-partition parquet segment like the other histories — the
    driver never gathers per-URL rows; the eager-list fallback exists
    only for log_dir-less unit cores."""
    self.flush_logs()
    out = {"metrics": self.get_metrics()}
    if not self.flush_fetch_log():
        out["fetch_log"] = self.fetch_log()
    return out


def _schedule_ipc(
    self, now_ms: int, wave_no: int | None = None, apply_blobs: list | None = None
) -> tuple:
    """Ray-boundary variant of schedule(): (Arrow IPC bytes,
    next-event-after-scan).  The driver uses the returned next-event to
    avoid a separate poll round (completions re-arm via the touched-
    partition report from the wave tasks).

    ``apply_blobs``: route-back payloads destined to THIS partition from
    the previous wave (pickled bytes or ObjectRefs of them — refs are
    pulled from the object store here, never through the driver),
    applied before the scan.  The steady-state driver forwards payloads
    eagerly via apply_pending as chunk tasks finish (per-caller actor
    FIFO ordering makes them apply before this RPC), so this argument
    is normally None; it remains for the flush/fallback paths.
    Partition state is independent, so apply-just-before-own-schedule
    is equivalent to the old global apply barrier.

    Returns (Arrow IPC bytes, next-event, {apply_s, scan_s}) — the
    actor-side seconds let the driver's GRAFT_TIMING report split the
    serial floor into apply vs scan."""
    import time as _time

    t0 = _time.process_time()
    if apply_blobs:
        self.apply_pending(apply_blobs)
    t1 = _time.process_time()
    t = self.schedule(now_ms, wave_no)
    if t.num_rows:
        _verify_launch_table(t, "actor-out")
    stats = {"apply_s": t1 - t0, "scan_s": _time.process_time() - t1}
    return table_to_ipc(t), self.next_event_ms(), stats


def _add_requests_blob(self, blob: bytes, token=None) -> int:
    """Ray-boundary variant: explicit pickled payload (bytes are immune
    to the Arrow-serializer corruption described at table_to_ipc)."""
    import pickle

    return self.add_requests(pickle.loads(blob), token=token)


def _complete_blob(self, blob: bytes, token=None) -> int:
    import pickle

    return self.complete(pickle.loads(blob), token=token)


def _concat_cols(parts: list) -> dict:
    if len(parts) == 1:
        return parts[0]
    return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}


def _apply_pending(self, blobs) -> int:
    """Apply a list of route-back payloads (bytes or ObjectRefs): the
    steady-state eager-delivery surface (payloads forwarded per chunk
    task as it finishes) and the driver's pre-checkpoint/final flush.

    Payloads are CONCATENATED per kind before application: chunk tasks
    slice waves at CHUNK_MIN_ROWS, so each per-partition payload holds
    only a handful of rows — applying them one by one kept the
    vectorized admission path at per-call fixed-cost scale.  Tokens are
    consumed up front (same exactly-once semantics: a retried task's
    duplicate blob is dropped before the concat); admission itself is
    order-commutative, so batching cannot change results."""
    import pickle
    import time as _time

    import ray

    t0 = _time.process_time()
    req_parts: list = []
    rep_parts: list = []
    for blob in blobs:
        if not isinstance(blob, bytes):
            blob = ray.get(blob)
        p = pickle.loads(blob)
        if p.get("req_cols") is not None and not self._apply_once(
            p.get("req_token")
        ):
            req_parts.append(p["req_cols"])
        if p.get("rep_cols") is not None and not self._apply_once(
            p.get("rep_token")
        ):
            rep_parts.append(p["rep_cols"])
    n = 0
    if req_parts:
        n += self.add_requests(_concat_cols(req_parts))
    if rep_parts:
        n += self.complete(_concat_cols(rep_parts))
    # process_time: CPU seconds, immune to preemption under
    # oversubscription (16 actors + workers on few cores)
    self._apply_secs = getattr(self, "_apply_secs", 0.0) + (
        _time.process_time() - t0
    )
    return n


def _get_apply_secs(self) -> float:
    return getattr(self, "_apply_secs", 0.0)


def _apply_blob(self, blob: bytes) -> int:
    """Combined requests+replies application: ONE RPC per partition per
    route-back batch instead of two (the scatter fan-out is the dominant
    fixed cost of small waves).  Payload: pickled
    {req_cols, req_token, rep_cols, rep_token}."""
    import pickle

    p = pickle.loads(blob)
    n = 0
    if p.get("req_cols") is not None:
        n += self.add_requests(p["req_cols"], token=p.get("req_token"))
    if p.get("rep_cols") is not None:
        n += self.complete(p["rep_cols"], token=p.get("rep_token"))
    return n


FrontierCore.finalize = _finalize
FrontierCore.schedule_ipc = _schedule_ipc
FrontierCore.add_requests_blob = _add_requests_blob
FrontierCore.complete_blob = _complete_blob
FrontierCore.apply_blob = _apply_blob
FrontierCore.apply_pending = _apply_pending
FrontierCore.get_apply_secs = _get_apply_secs


# ---------------------------------------------------------------------------
# sequential oracle
# ---------------------------------------------------------------------------


class _LocalCrawlCtx:
    """Sequential-oracle twin of _RayCrawlCtx (same wave protocol, no
    Ray) — also step-able for multi-collection rotation."""

    def __init__(self, web, host_ip, web_cfg, cfg, out_dir):
        import time as _time

        self.cfg = cfg
        self.out_dir = out_dir
        P = self.P = cfg.num_partitions
        log_dir = os.path.join(out_dir, "frontier")
        self.cores = [FrontierCore(p, cfg, log_dir) for p in range(P)]
        cols = seed_columns(web, host_ip)
        for p, sub in split_by_partition(cols, P):
            self.cores[p].add_requests(sub)
        self.fetcher = FetchStage(web_cfg, cfg.user_agent)
        self.parser = ParseStage(web_cfg, P)
        self.now = 0
        self.waves = 0
        # mirror of the distributed protocol: per-partition event
        # tracking, only due partitions scheduled, driver wave numbers
        self.events = {p: c.next_event_ms() for p, c in enumerate(self.cores)}
        self.t_start = _time.monotonic()
        self.done = False

    def step(self) -> bool:
        import time as _time

        if self.done:
            return False
        cfg, P = self.cfg, self.P
        nxt = min(self.events.values())
        if nxt >= INF or nxt > cfg.horizon_ms:
            self.done = True
            return False
        if cfg.real_clock:
            wall = int((_time.monotonic() - self.t_start) * 1000)
            if nxt > wall:
                _time.sleep((nxt - wall) / 1000.0)
            self.now = max(int((_time.monotonic() - self.t_start) * 1000), nxt)
        else:
            self.now = max(self.now, nxt + cfg.wave_window_ms)
        now = self.now
        due = [p for p in range(P) if self.events[p] <= now]
        tables = []
        for p in due:
            t = self.cores[p].schedule(now, self.waves)
            self.events[p] = self.cores[p].next_event_ms()
            if t.num_rows:
                tables.append(t)
        self.waves += 1
        for t in tables:
            recs = self.parser(self.fetcher(t))
            docs, reqs, reps = _split_records(recs)
            if docs.num_rows:
                _write_doc_table(docs, self.out_dir, str(docs["wave"][0].as_py()))
            for p, sub in _group_parts(reqs):
                lcols = _table_to_cols(sub, REQUEST_COLS)
                # mirror the ray path's gate placement: full hash64b at
                # route-back build, cheap checksum at actor-in
                verify_request_cols(lcols, "routeback-out")
                lcols["ck32"] = transit_ck32(lcols["url"], lcols["uh48"])
                self.cores[p].add_requests(lcols)
                self.events[p] = 0
            for p, sub in _group_parts(reps):
                self.cores[p].complete(_table_to_cols(sub, REPLY_COLS))
                self.events[p] = 0
        return True

    def finalize(self) -> CrawlResult:
        data = [c.finalize() for c in self.cores]
        return _merge_results(data, self.out_dir, self.waves)


def _run_local(web, host_ip, web_cfg, cfg, out_dir):
    ctx = _LocalCrawlCtx(web, host_ip, web_cfg, cfg, out_dir)
    while ctx.step():
        pass
    return ctx.finalize()


# ---------------------------------------------------------------------------
# multi-collection rotation
# ---------------------------------------------------------------------------


def run_multi_crawl(
    web_cfg: WebConfig,
    colls: dict,
    out_dir: str,
    engine: str = "ray",
) -> dict:
    """Round-robin crawl over collections (reference: SpiderLoop's
    collection rotation, getNextCollToSpider — each active collection
    gets one spider round per rotation).  ``colls`` maps collection
    name → CrawlConfig; each collection owns isolated frontier state,
    filters/sitelist, and output under ``out_dir/coll=<name>``.
    Because collections share nothing but the fetch fan-out, the
    interleaved results are identical to standalone runs per
    collection (tests/test_multicoll.py pins this)."""
    import shutil

    web = get_web(web_cfg)
    host_ip = {h: int(ip) for h, ip in zip(web.hosts, web.ips)}
    ctxs = {}
    for name, cfg in colls.items():
        sub = os.path.join(out_dir, f"coll={name}")
        os.makedirs(sub, exist_ok=True)
        for s in ("docs", "checkpoints", "frontier"):
            shutil.rmtree(os.path.join(sub, s), ignore_errors=True)
        if not cfg.site_list:
            from dataclasses import replace

            cfg = replace(cfg, site_list=tuple(web.site_list()))
        if engine == "ray":
            ctxs[name] = _RayCrawlCtx(web, host_ip, web_cfg, cfg, sub, 0, False)
        else:
            ctxs[name] = _LocalCrawlCtx(web, host_ip, web_cfg, cfg, sub)
    active = True
    while active:
        active = False
        for ctx in ctxs.values():  # fixed rotation order
            if ctx.step():
                active = True
    return {name: ctx.finalize() for name, ctx in ctxs.items()}
