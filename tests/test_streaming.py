"""Structured Streaming smoke tests: watermarked windows over a file source."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_ingestion_s3_to_parquet_spark.streaming.stream import (
    EVENTS_STREAM_SCHEMA,
    events_file_stream,
    run_stream_once,
    windowed_counts_stream,
)


def _write_events(spark, path: str) -> None:
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), i % 5, ["click", "view"][i % 2], float(i))
        for i in range(40)
    ]
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).write.mode("overwrite").parquet(path)


def test_stream_windowed_counts_end_to_end(spark, tmp_path):
    src = str(tmp_path / "events_stream")
    _write_events(spark, src)
    stream = events_file_stream(spark, src)
    assert stream.isStreaming
    agg = windowed_counts_stream(stream, watermark="10 minutes", window="1 hour")
    rows = run_stream_once(agg, name="smoke_counts")
    assert len(rows) > 0
    # batch equivalence: same expression in batch mode gives same totals
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert sum(r.n_events for r in rows) == sum(r.n_events for r in batch.collect())


def test_stream_watermark_drops_late_rows(spark, tmp_path):
    # Two availableNow runs over a shared checkpoint: run 1 ingests
    # on-time data and persists its watermark; run 2 then sees a
    # straggler 6h behind it. Deterministic by construction (watermark
    # state lives in the checkpoint, not in microbatch file ordering).
    src = tmp_path / "late_events"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    out = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(str(src))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.ws: r.n for r in spark.read.parquet(out).collect()}

    import glob as globmod
    import shutil

    def add_file(rows, name):
        staging = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).repartition(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = globmod.glob(f"{staging}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    on_time = [(i, base + dt.timedelta(minutes=i), 1, "click", 1.0) for i in range(0, 240, 10)]
    add_file(on_time, "p1")
    run_once()  # advances the checkpointed watermark to 03:40

    late = [(99, base - dt.timedelta(hours=6), 1, "click", 1.0)]
    add_file(late, "p2")
    got = run_once()

    # the straggler's window is far behind the watermark: never emitted
    late_window = base - dt.timedelta(hours=6)
    assert late_window not in got
    # windows that closed under the watermark did emit (00:00–03:00)
    on_time_windows = {ws for ws in got if ws >= base}
    assert len(on_time_windows) >= 3
    assert all(got[ws] > 0 for ws in on_time_windows)


def test_stream_static_enrichment_join(spark, tmp_path):
    # stream-static join: the canonical dim-enrichment pattern — the
    # static side is re-read per micro-batch (picks up dim updates),
    # needs no watermark, and plans as a broadcast against each batch
    src = str(tmp_path / "events_stream")
    _write_events(spark, src)
    dim = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(5)], "user_id long, segment string"
    )
    stream = events_file_stream(spark, src)
    enriched = stream.join(F.broadcast(dim), "user_id", "left").groupBy(
        "segment"
    ).agg(F.count("*").alias("n"))
    rows = run_stream_once(enriched, name="smoke_enrich")
    assert sum(r.n for r in rows) == 40
    assert {r.segment for r in rows} == {"segment_0", "segment_1", "segment_2"}
