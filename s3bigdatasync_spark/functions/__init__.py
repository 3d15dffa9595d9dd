"""Scalar / pandas UDFs (SURVEY §2 H)."""
