"""Query operators. Each module exports ``QUERIES: list[Query]``."""
