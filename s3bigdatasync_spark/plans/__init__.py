"""End-to-end pipelines (SURVEY §3 lifecycles)."""
