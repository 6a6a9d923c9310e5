"""Streaming queries."""

QUERIES = {}
ORACLES = {}
