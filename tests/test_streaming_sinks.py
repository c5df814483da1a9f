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


def test_idempotent_sink_overwrites_on_redelivery(spark, tmp_path):
    # Crash-recovery evidence for the exactly-once-by-idempotence claim
    # (streaming/stream.py::idempotent_parquet_sink): kill a completed
    # corpus-ingest run's LAST batch commit (the exact crash window —
    # sink ran, offsets not yet committed), restart a NEW query on the
    # SAME checkpoint, and assert Spark re-delivers that batch_id and
    # the sink overwrites its directory instead of duplicating rows.
    import os

    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        DOCS_STREAM_SCHEMA,
        corpus_ingest_stream,
        documents_file_stream,
        idempotent_parquet_sink,
    )

    base = dt.datetime(2024, 1, 1)
    words = lambda i: " ".join(f"w{i}_{k}" for k in range(8))  # noqa: E731
    # two input files -> two micro-batches (maxFilesPerTrigger=1); a
    # cross-file duplicate text (doc 20 repeats doc 1's body) proves
    # dedup state also survives the restart
    f1 = [(i, base + dt.timedelta(minutes=i), words(i), "en", "crawl") for i in range(10)]
    f2 = [(10 + i, base + dt.timedelta(minutes=10 + i), words(10 + i), "en", "crawl") for i in range(9)]
    f2.append((20, base + dt.timedelta(minutes=20), words(1), "en", "crawl"))
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(f1, DOCS_STREAM_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(f2, DOCS_STREAM_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            corpus_ingest_stream(documents_file_stream(spark, src))
            .writeStream.foreachBatch(idempotent_parquet_sink(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    committed = sorted(
        int(f) for f in os.listdir(f"{ckpt}/commits") if f.isdigit()
    )
    assert len(committed) >= 2  # one per input file
    last = committed[-1]
    landed = spark.read.parquet(out)
    expect = sorted(r.doc_id for r in landed.select("doc_id").collect())
    assert expect == list(range(19))  # doc 20 deduped against doc 1

    # simulate the crash: batch `last` ran its sink but never committed.
    # The hidden Hadoop ChecksumFs sibling must go too — a real crash
    # writes neither file, and a leftover .crc makes the re-commit
    # rename fail with a spurious "multiple queries" error.
    os.remove(f"{ckpt}/commits/{last}")
    crc = f"{ckpt}/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    before_mtime = os.path.getmtime(f"{out}/batch_id={last}")
    run_once()

    # the batch directory was rewritten (overwrite, not skip) ...
    assert os.path.getmtime(f"{out}/batch_id={last}") >= before_mtime
    assert os.path.exists(f"{ckpt}/commits/{last}")
    # ... and re-delivery added NO duplicate rows anywhere
    again = spark.read.parquet(out)
    got = sorted(r.doc_id for r in again.select("doc_id").collect())
    assert got == expect


def test_stream_ingest_then_compact_end_to_end(spark, tmp_path):
    # the full landing-zone lifecycle: micro-batched stream ingest
    # (one tiny file per batch) -> batch compaction over the landed
    # directory -> same rows, fewer files
    import os

    from data_ingestion_s3_to_parquet_spark.sources.sinks import compact_parquet
    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        DOCS_STREAM_SCHEMA,
        corpus_ingest_stream,
        documents_file_stream,
        idempotent_parquet_sink,
    )

    base = dt.datetime(2024, 1, 1)
    words = lambda i: " ".join(f"w{i}_{k}" for k in range(8))  # noqa: E731
    src = str(tmp_path / "src")
    for f in range(5):   # five input files -> five micro-batches
        rows = [
            (f * 10 + i, base + dt.timedelta(minutes=f * 10 + i), words(f * 10 + i), "en", "crawl")
            for i in range(10)
        ]
        spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "landed")
    q = (
        corpus_ingest_stream(documents_file_stream(spark, src))
        .writeStream.foreachBatch(idempotent_parquet_sink(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def parquet_files(p):
        return [
            os.path.join(d, f)
            for d, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        ]

    n_before_files = len(parquet_files(out))
    assert n_before_files >= 5          # at least one file per micro-batch
    before = spark.read.parquet(out)
    n_rows = before.count()
    assert n_rows == 50
    fps = {r.fp for r in before.select("fp").collect()}

    n_after = compact_parquet(spark, out, target_file_bytes=64 * 1024 * 1024)
    files = parquet_files(out)
    assert len(files) == n_after < n_before_files
    after = spark.read.parquet(out)
    assert after.count() == n_rows
    assert {r.fp for r in after.select("fp").collect()} == fps


def test_cdc_materialize_stream_versions_latest_snapshots(spark, tmp_path):
    # streaming upsert into a manifest table: after each availableNow
    # run the table holds latest-per-user; retained generations give
    # time travel to the pre-batch snapshot; a re-merge is idempotent
    import datetime as dt

    import pyspark.sql.functions as F

    from data_ingestion_s3_to_parquet_spark.sources.sinks import (
        manifest_table_generations,
        manifest_table_read,
    )
    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        EVENTS_STREAM_SCHEMA,
        cdc_materialize_stream,
    )

    base = dt.datetime(2024, 1, 1)
    b1 = [
        (1, base, 1, "click", 1.0),
        (2, base + dt.timedelta(minutes=1), 2, "view", 2.0),
    ]
    b2 = [
        (3, base + dt.timedelta(minutes=5), 1, "purchase", 9.0),  # supersedes 1
        (4, base + dt.timedelta(minutes=6), 3, "signup", 4.0),    # new key
    ]
    src = str(tmp_path / "events")
    root = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
        q = (
            cdc_materialize_stream(stream, root)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(b1, EVENTS_STREAM_SCHEMA).repartition(1).write.parquet(src)
    run_once()
    snap1 = {
        (r.user_id, r.event_id)
        for r in manifest_table_read(spark, root).collect()
    }
    assert snap1 == {(1, 1), (2, 2)}

    spark.createDataFrame(b2, EVENTS_STREAM_SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    snap2 = {
        (r.user_id, r.event_id)
        for r in manifest_table_read(spark, root).collect()
    }
    assert snap2 == {(1, 3), (2, 2), (3, 4)}  # latest-wins upsert

    # time travel: the previous retained generation is the b1 snapshot
    gens = manifest_table_generations(root)
    assert len(gens) == 2
    old = {
        (r.user_id, r.event_id)
        for r in manifest_table_read(spark, root, generation=gens[0]).collect()
    }
    assert old == snap1
