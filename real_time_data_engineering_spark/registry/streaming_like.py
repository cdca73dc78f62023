"""Streaming-semantics queries in batch-checkable form (filled incrementally)."""
