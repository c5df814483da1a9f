"""Subprocess driver for the transformWithStateInPandas execution
test (tests/test_stateful.py::test_transform_with_state_totals_match_
batch_agg).

Runs in its OWN interpreter + JVM with ``tools/pbshim`` on PYTHONPATH
(sitecustomize appends the Cloud-SDK-bundled pure-Python protobuf and
lifts the runtime_version minor so pyspark's 6.33 gencode loads — see
tools/pbshim/sitecustomize.py). A subprocess, not the shared pytest
session, because the shim must be active in the Spark *workers* from
JVM launch, and mutating the shared session's environment would leak
the shim into every other test.

Prints exactly one JSON line: {"streaming": {...}, "batch": {...}}
mapping user_id -> [n_events, sum_value_cents], where ``streaming``
is the LAST emitted row per user after draining a two-file
maxFilesPerTrigger=1 stream (so state restore AND update both
execute) and ``batch`` is the groupBy twin over the same rows.
"""

import datetime as dt
import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    import google.protobuf  # noqa: F401 — fail fast if the shim didn't load

    import pyspark.sql.functions as F

    from data_ingestion_s3_to_parquet_spark.streaming.statev2 import (
        running_totals_stateful,
    )
    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        EVENTS_STREAM_SCHEMA,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1 + i % 3, "click", 1.25 * i)
        for i in range(30)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/events"
        # two parquet files + maxFilesPerTrigger=1 -> at least two batches
        spark.createDataFrame(rows[:15], EVENTS_STREAM_SCHEMA).repartition(
            1
        ).write.parquet(src)
        spark.createDataFrame(rows[15:], EVENTS_STREAM_SCHEMA).repartition(
            1
        ).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            running_totals_stateful(stream)
            .writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # update mode emits one row per (user, batch); the LAST row
        # per user is the lifetime total
        streaming = {}
        for r in spark.sql("SELECT * FROM running_totals").collect():
            streaming[r.user_id] = [r.n_events, r.sum_value_cents]

        batch = {
            r.user_id: [r.n, r.cents]
            for r in (
                spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA)
                .groupBy("user_id")
                .agg(
                    F.count("*").alias("n"),
                    F.sum(
                        F.round(F.col("value") * 100).cast("long")
                    ).alias("cents"),
                )
                .collect()
            )
        }
    spark.stop()
    print(
        json.dumps(
            {
                "streaming": {str(k): v for k, v in streaming.items()},
                "batch": {str(k): v for k, v in batch.items()},
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
