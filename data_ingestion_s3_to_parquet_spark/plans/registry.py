"""The query registry: every SURVEY.md §2 operator, name → (fn, oracle).

``__spark_entry__`` re-exports :func:`queries` / :func:`oracle_sql` from
here; tests and bench.py iterate the same registry, so there is exactly
one source of truth for what the engine claims to implement.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

from .spec import Query

# Operator modules contributing QUERIES lists (extended as waves land).
_MODULES = (
    "data_ingestion_s3_to_parquet_spark.operators.relational",
    "data_ingestion_s3_to_parquet_spark.operators.relational2",
    "data_ingestion_s3_to_parquet_spark.operators.relational3",
    "data_ingestion_s3_to_parquet_spark.operators.relational4",
    "data_ingestion_s3_to_parquet_spark.operators.relational5",
    "data_ingestion_s3_to_parquet_spark.operators.dedup",
    "data_ingestion_s3_to_parquet_spark.operators.trainprep",
    "data_ingestion_s3_to_parquet_spark.operators.similarity",
    "data_ingestion_s3_to_parquet_spark.operators.textstats",
    "data_ingestion_s3_to_parquet_spark.operators.multimodal",
    "data_ingestion_s3_to_parquet_spark.streaming.windows",
)


def _collect() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for mod_name in _MODULES:
        mod = import_module(mod_name)
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name: {q.name}")
            out[q.name] = q
    return out


REGISTRY: dict[str, Query] = _collect()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
