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

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files and atomically swap
    it in. Returns the new file count.

    Streaming ingestion (one file per micro-batch per partition) and
    over-parallel writers both leave directories of tiny files whose
    per-file open/footer cost dominates 100 TB scans. The compactor
    sizes the rewrite from the directory's actual bytes — a
    ``repartition(n)`` round-robin shuffle, which (unlike
    ``coalesce(n)``) rebalances skewed inputs and keeps the write
    parallel. The swap is write-to-side-dir + two renames. Crash
    contract: the ORIGINAL data is never lost — between the two
    renames ``path`` briefly does not exist (a reader in that window
    fails and retries), and a crash there leaves the complete old
    layout at ``*._compact_old``. Stale ``._compact_tmp`` /
    ``._compact_old`` leftovers from a crashed run are cleaned up (or
    restored) on the next call, so compaction is always retryable. On
    an object store the same pattern runs against a manifest/table
    format (Delta ``OPTIMIZE``, Iceberg rewrite) whose metadata commit
    IS atomic — directory renames are the local-FS stand-in.
    """
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # recover from a prior crashed run: a leftover old-dir means the
    # crash hit between the renames — the old layout is complete, so
    # restore it if the target vanished, else drop it. A leftover tmp
    # is always a partial write: discard.
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    total = sum(
        os.path.getsize(os.path.join(dirp, f))
        for dirp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out for min/max scan pruning on
    ``cluster_cols``: range-partition rows across files by the cluster
    key, then sort within each file.

    Parquet readers skip row groups (and whole files) whose footer
    min/max stats exclude the predicate — but only if the writer made
    those ranges narrow. A hash-partitioned write scatters every key
    range across every file (stats span everything, nothing prunes);
    ``repartitionByRange`` + ``sortWithinPartitions`` gives each file a
    tight, near-disjoint key range, so a point or range predicate
    touches O(1) files instead of all of them. This is the single-key
    form of Delta's OPTIMIZE ZORDER / Iceberg's sort order rewrite —
    at 100 TB, layout is the cheapest query accelerator there is
    (written once, pays on every scan). Disjointness is asserted in
    ``tests/test_sinks.py`` from the files' actual footer ranges.
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
