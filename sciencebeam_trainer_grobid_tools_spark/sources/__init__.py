"""Corpus sources, table IO and resume helpers."""
