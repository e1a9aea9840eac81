"""Deterministic synthetic-web fixtures + table IO helpers."""
