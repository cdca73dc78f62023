"""Medallion-pipeline queries over the driver corpus (filled incrementally)."""
