"""open_source_search_engine_ray — a Ray-Data-native crawl/frontier engine.

A from-scratch reimplementation of the *spider* subsystem of Gigablast
(reference: /root/reference, the Privacore fork of
exename/open-source-search-engine) as an idiomatic Ray Data pipeline:

- pure vectorizable kernels in ``functions/`` (URL hashing, canonicalization,
  robots.txt, the URL-filter DSL, winner selection, frontier dedup),
- stateless ``map_batches`` stages in ``stages/``,
- per-partition stateful scheduler/fetch state in ``state/`` (actor pools),
- end-to-end pipelines + the pure-Python reference-semantics oracle in
  ``pipelines/``,
- deterministic synthetic-web fixtures in ``sources/``.

Nothing here calls ``ray.init()``; the caller (bench.py, tests' conftest,
or the driver) owns the Ray session.
"""

__version__ = "0.1.0"
