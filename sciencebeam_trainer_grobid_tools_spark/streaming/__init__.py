"""Incremental / resumable execution."""
