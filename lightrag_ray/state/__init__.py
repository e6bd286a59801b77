"""Checkpoint manifest + per-partition lineage."""
