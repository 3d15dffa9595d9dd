"""Structured Streaming variants (SURVEY §2 G / D4-D5 streaming legs)."""
