"""Source connectors (SURVEY §2 A1-A7)."""
