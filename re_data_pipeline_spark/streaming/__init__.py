"""Structured Streaming variants of the incremental semantics (SURVEY §2.9)."""
