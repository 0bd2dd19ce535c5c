"""Declarative pipeline builders (logical plans; Catalyst optimizes)."""
