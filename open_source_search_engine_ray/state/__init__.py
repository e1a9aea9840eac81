"""Per-partition mutable state: URL-seen filters and the frontier
scheduler core (wrapped by a Ray actor in the distributed engine and
driven directly by the sequential oracle)."""
