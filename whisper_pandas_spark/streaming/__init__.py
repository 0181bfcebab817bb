"""Structured Streaming surface (rollups with watermarks)."""
