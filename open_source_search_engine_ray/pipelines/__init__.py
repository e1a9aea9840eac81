"""End-to-end pipelines: the distributed crawl engine, the sequential
oracle, and the training-data/relational operator suites."""
