"""Deterministic synthetic corpus generation (pages table + goldens)."""
