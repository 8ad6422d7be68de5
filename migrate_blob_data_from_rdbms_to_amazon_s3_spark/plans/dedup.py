"""Placeholder — filled in a later milestone."""

QUERIES: dict = {}
ORACLES: dict = {}
