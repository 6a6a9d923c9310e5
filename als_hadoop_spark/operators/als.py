"""Placeholder — filled in by later milestone."""

QUERIES = {}
ORACLES = {}
