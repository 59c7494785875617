"""Structured Streaming front-end for incremental index maintenance."""
