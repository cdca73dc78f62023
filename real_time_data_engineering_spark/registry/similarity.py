"""Similarity-search queries on `embeddings` (filled incrementally)."""
