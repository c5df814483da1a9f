"""Custom streaming Python DataSource: deterministic parquet replay.

``spark.readStream.format("replay").load(path)`` turns a static
parquet table into a micro-batched STREAM — the backfill/reprocessing
primitive: replay yesterday's events through the same streaming
pipeline that handles live data (windows, watermarks, stateful
operators), instead of maintaining a separate batch path. Built on
Spark 4's ``DataSourceStreamReader`` API, so the engine owns offsets,
checkpointing, and exactly-once accounting like any first-class
source.

Contract:

- Rows are replayed in a FIXED total order (sorted by ``orderBy``,
  default the first column), in chunks of ``rowsPerBatch`` per
  micro-batch. Offsets are plain row positions — restart from a
  checkpoint resumes at the exact row, and two replays of the same
  table produce identical batch contents.
- ``latestOffset`` advances at most ``rowsPerBatch`` past the last
  committed position: backpressure by construction, never "the whole
  table in one batch" (availableNow still drains everything, one
  bounded batch at a time).
- ``read(partition)`` runs on executors: scan the parquet, sort,
  slice [start, end) — correctness-first. At 100 TB the slice path
  would push down to row-group ranges over a presorted layout
  (write_clustered_parquet provides exactly that layout); the offset
  protocol and batch shape stay identical.

This mirrors sources/pyds.py (batch zip-CSV DataSource): together
they cover both halves of the Spark 4 Python DataSource API surface.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

DEFAULT_ROWS_PER_BATCH = 1000


class _RangePartition(InputPartition):
    def __init__(self, path: str, order_by: str, start: int, end: int) -> None:
        self.path = path
        self.order_by = order_by
        self.start = start
        self.end = end


class ReplayDataSource(DataSource):
    """``spark.readStream.format("replay").schema(s).load(path)``.

    Options: ``rowsPerBatch`` (int), ``orderBy`` (column name; the
    replay order — must be a unique key for a total order).
    A schema is required (the stream reader cannot infer one lazily);
    pass the table's parquet schema.
    """

    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self) -> str:
        raise ValueError(
            "replay requires an explicit .schema(...) — pass the parquet "
            "table's schema"
        )

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _ReplayStreamReader(self.options, schema)


class _ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema: StructType) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("replay requires a path")
        self._order_by = options.get("orderBy") or schema.fields[0].name
        self._rows_per_batch = int(
            options.get("rowsPerBatch", DEFAULT_ROWS_PER_BATCH)
        )
        self._total = self._count_rows()

    def _count_rows(self) -> int:
        import pyarrow.parquet as pq

        if os.path.isdir(self._path):
            files = [
                os.path.join(dirp, f)
                for dirp, _, fs in os.walk(self._path)
                for f in fs
                if f.endswith(".parquet")
            ]
        else:
            files = [self._path]
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # advance one bounded chunk per micro-batch (backpressure);
        # the engine persists the committed position in its checkpoint
        cur = getattr(self, "_committed", 0)
        return {"pos": min(cur + self._rows_per_batch, self._total)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._committed = end["pos"]
        if start["pos"] >= end["pos"]:
            return []
        return [
            _RangePartition(
                self._path, self._order_by, start["pos"], end["pos"]
            )
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        table = table.sort_by(partition.order_by)
        return iter(
            table.slice(
                partition.start, partition.end - partition.start
            ).to_batches()
        )

    def commit(self, end: dict) -> None:
        pass


def register_replay(spark) -> None:
    """Idempotently register the replay stream format on this session."""
    spark.dataSource.register(ReplayDataSource)
