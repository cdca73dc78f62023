"""Deduplication + text-analysis queries on `documents` (filled incrementally)."""
