"""Structured Streaming surfaces (incremental ingest + windowed state)."""
