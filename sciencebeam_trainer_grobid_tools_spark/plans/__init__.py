"""End-to-end Spark pipelines."""
