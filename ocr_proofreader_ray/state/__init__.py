"""Shared-state components: per-partition lineage counters and the
checkpoint-resume manifest (SURVEY.md §2 A11/A12)."""
