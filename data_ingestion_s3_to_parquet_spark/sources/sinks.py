"""Output sinks: parquet (partitioned / bucketed), CSV, JSON.

The reference's only sink is a single local parquet file
(``/root/reference/src/main.rs:41-42``). At scale the sink strategy is
as important as the scan: partition layout determines downstream
partition pruning, and bucketing pre-shuffles data so later joins on
the bucket key skip their exchange entirely.

Rules encoded here:
- never ``coalesce(1)`` (the single-file layout is a non-goal);
- partition columns must be low-cardinality (date/region-style), or the
  file count explodes — callers pass them explicitly;
- bucketed tables go through ``saveAsTable`` (bucket metadata lives in
  the catalog, not the directory layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet directory sink, optionally hive-partitioned.

    ``maxRecordsPerFile`` caps file sizes without a repartition (tasks
    roll to new files); for target-sized files at scale prefer AQE +
    ``spark.sql.files.maxRecordsPerFile`` globally.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffled on ``bucket_cols`` so that
    joins/aggregations on those keys skip the exchange (verify: the
    join plan shows no Exchange above the bucketed scan)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
