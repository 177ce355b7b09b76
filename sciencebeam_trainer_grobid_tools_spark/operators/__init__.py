"""Document-level and corpus-level operators."""
