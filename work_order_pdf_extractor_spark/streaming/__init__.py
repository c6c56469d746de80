"""Structured-Streaming-shaped incremental execution (SURVEY §2.8)."""
