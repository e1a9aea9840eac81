"""Stateless/actor-pool map_batches stages for the crawl pipeline."""
