"""Native DataFrame orchestration operators (routing, skew, lineage, resume)."""
