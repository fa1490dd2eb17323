"""Execution-state machinery: per-partition checkpoints, lineage and
metrics records, skew-salting helpers."""
