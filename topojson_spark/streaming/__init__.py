"""Structured-Streaming ingest front for the engine."""
