"""Corpus sources: parquet readers + the deterministic synthetic web table."""
