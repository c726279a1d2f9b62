"""Structured Streaming: incremental file ingestion + windowed aggs."""
