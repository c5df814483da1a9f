"""Streaming dedup + foreachBatch sink tests."""

from __future__ import annotations

import datetime as dt
import glob

from pyspark.sql import functions as F

from data_ingestion_s3_to_parquet_spark.streaming.stream import EVENTS_STREAM_SCHEMA


def test_stream_drop_duplicates(spark, tmp_path):
    # duplicate event_ids across two files: streaming dedup keeps one
    base = dt.datetime(2024, 1, 1)
    rows1 = [(i, base + dt.timedelta(minutes=i), 1, "click", 1.0) for i in range(10)]
    rows2 = [(i, base + dt.timedelta(minutes=i), 1, "click", 1.0) for i in range(5, 15)]
    src = str(tmp_path / "dup_events")
    spark.createDataFrame(rows1 + rows2, EVENTS_STREAM_SCHEMA).repartition(2).write.parquet(src)

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    ids = [r.event_id for r in got]
    assert sorted(ids) == list(range(15))  # each id exactly once
    assert len(ids) == len(set(ids))


def test_foreach_batch_sink(spark, tmp_path):
    # foreachBatch: arbitrary batch-sink logic (here: partitioned parquet
    # + a side metrics file per microbatch)
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), i % 3, "click", float(i)) for i in range(30)]
    src = str(tmp_path / "fb_events")
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).repartition(1).write.parquet(src)
    out = str(tmp_path / "fb_out")

    def sink(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert back.count() == 30
    assert "batch_id" in back.columns
    assert glob.glob(f"{out}/*.parquet") or glob.glob(f"{out}/part-*")
