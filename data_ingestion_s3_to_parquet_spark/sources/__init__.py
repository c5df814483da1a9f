"""Data sources: fixture-table catalog, CSV/zip/S3 ingestion inputs."""

from .catalog import TABLES, load_table, register_views  # noqa: F401
