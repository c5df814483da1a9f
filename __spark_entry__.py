"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_ingestion_s3_to_parquet_spark``; this
module only adapts the query registry
(``data_ingestion_s3_to_parquet_spark.plans.registry``) to the driver's
three-function surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_s3_to_parquet_spark.plans import registry as _registry
from data_ingestion_s3_to_parquet_spark.operators.relational import q_join_inner

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: revenue by nation —
    lineitem ⋈ orders ⋈ customer ⋈ broadcast(nation), filtered on
    l_shipdate, grouped, decimal-exact revenue sum. Driver checks rows>0.
    """
    return q_join_inner(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    return _registry.oracle_sql()
