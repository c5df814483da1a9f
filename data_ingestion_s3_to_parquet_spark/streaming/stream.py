"""True Structured Streaming entry points (readStream / writeStream).

The batch-checkable window queries live in ``streaming.windows`` — the
expressions there run unchanged under these streaming harnesses. Here:

- :func:`events_file_stream` — file-source stream over an events-shaped
  parquet directory (the fixture layout), for end-to-end smoke tests.
- :func:`windowed_counts_stream` — watermarked tumbling-window agg, the
  canonical late-data-tolerant streaming aggregation.
- :func:`run_stream_once` — drive a streaming query to completion over
  the currently-available input (availableNow trigger) into a memory
  sink and return the collected rows.

Scale: watermark + window state lives in the state store, partitioned
by group key; ``availableNow`` gives deterministic batch-boundary
semantics for tests while the same code deploys against a real
continuous source (kafka/kinesis) untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..session import tune

# events-shaped schema with a microsecond ts (streams can't use the
# nanosAsLong legacy read path; tests write their own parquet input)
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def events_file_stream(spark: SparkSession, path: str) -> DataFrame:
    tune(spark)
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def windowed_counts_stream(
    events: DataFrame, *, watermark: str = "10 minutes", window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window count/sum with a watermark: rows later than the
    watermark past their window close are dropped; the same F.window
    expression as the batch oracle query ``stream_tumbling``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_events_stream(
    events: DataFrame,
    *,
    bucket: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming at-least-once → effectively-once dedup: drop repeated
    deliveries of the same logical event — same (user_id, event_type)
    in the same event-time ``bucket`` — keeping the FIRST arrival, via
    ``dropDuplicatesWithinWatermark``. The retry-storm cleaner that
    sits in front of every downstream streaming aggregate.

    Why ``WithinWatermark``: plain ``dropDuplicates`` on a stream keys
    state forever — unbounded growth. The watermark variant evicts a
    key's dedup state once the watermark passes its event time, so
    state is bounded by one watermark's worth of distinct keys.

    The no-duplicate-escapes guarantee REQUIRES ``watermark >=
    bucket`` (the default: both 1 hour). Two deliveries of one logical
    event can carry different event times inside the same bucket —
    ``dropDuplicatesWithinWatermark`` only collapses rows whose event
    times are within the delay of the first arrival, so a delay
    shorter than the bucket span lets a same-bucket redelivery >delay
    later slip through once the first key's state is evicted. With
    ``watermark >= bucket`` every intra-bucket timestamp gap fits
    inside the delay, and a redelivery past the watermark is by
    definition late data and dropped outright (both pinned in
    tests/test_streaming.py) — the trade is that a genuinely-new event
    that late is dropped too, the same contract every watermarked
    operator makes. Callers that shrink the watermark below the bucket
    span trade the guarantee down to exact-timestamp redeliveries (and
    same-bucket spreads within the delay) in exchange for less state.
    State is hash-partitioned by the dedup key — the usual skew story.

    Batch twin: the graded ``stream_dedup`` query
    (``windows.q_stream_dedup``) computes the deterministic form —
    per-key survivor election by min event_id — because batch
    ``dropDuplicates`` keeps an arbitrary row; the streaming
    first-arrival semantics are pinned in tests/test_streaming.py with
    controlled arrival order.
    """
    return (
        events.withWatermark("ts", watermark)
        .withColumn("ts_bucket", F.window("ts", bucket).getField("start"))
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "ts_bucket"])
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    watermark: str = "10 minutes",
    within: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval bound: a
    right-side row matches a left-side row with the same ``key`` when
    ``r.ts ∈ [l.ts, l.ts + within]`` (the attribution pattern — e.g.
    clicks joined to the impression they follow).

    The time bound is what makes this run at scale: with watermarks on
    BOTH inputs plus the interval condition, Spark can prove when a
    buffered row can never match again and evict it, so join state is
    bounded by (watermark + within) of traffic per key instead of the
    whole history. Without the bound, stream-stream join state grows
    forever. State is hash-partitioned by the join key — same skew
    story as any keyed shuffle.

    ``how="leftOuter"`` adds the unmatched-left lane: a left row with
    no match emits null-padded ONLY when the watermark proves no
    future right row can still match it — i.e. outer results are
    EVICTION-DRIVEN and arrive one watermark delay late (tested in
    tests/test_streaming.py); an outer join without the interval
    bound would be rejected, since "never matches again" would be
    unprovable.
    """
    l_ = left.withWatermark("ts", watermark).alias("l")
    r_ = right.withWatermark("ts", watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.ts >= l.ts AND r.ts <= l.ts + interval {within}"
    )
    return l_.join(r_, cond, how).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
        (F.unix_timestamp("r.ts") - F.unix_timestamp("l.ts")).alias("lag_sec"),
    )


DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
    ]
)


def documents_file_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    tune(spark)
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def corpus_ingest_stream(
    docs: DataFrame,
    *,
    watermark: str = "30 minutes",
    min_words: int = 5,
    max_words: int = 100_000,
) -> DataFrame:
    """The streaming twin of the batch ``corpus_prep`` pipeline: a
    continuously-arriving document stream → quality gate → exact
    content dedup, ready for an idempotent sink.

    The dedup is ``dropDuplicatesWithinWatermark`` on a sha256 content
    fingerprint: duplicates arriving within the watermark horizon are
    dropped no matter which micro-batch they land in, and — unlike
    plain ``dropDuplicates``, whose streaming state grows forever —
    fingerprint state older than the watermark is evicted, so state is
    bounded by one horizon of traffic. That is the right contract for
    crawl ingestion, where re-fetches cluster in time; cross-horizon
    dedup belongs to the periodic batch compaction (``dedup_exact``)
    over the landed corpus. Quality gating happens BEFORE the dedup so
    rejected docs never enter the state store.
    """
    n_words = F.size(F.split(F.col("text"), " "))
    return (
        docs.withWatermark("ts", watermark)
        .where(n_words.between(min_words, max_words))
        .withColumn("fp", F.sha2(F.col("text"), 256))
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "ts", "lang", "source", "fp", n_words.alias("n_words"))
    )


def idempotent_parquet_sink(out_dir: str):
    """A ``foreachBatch`` sink with exactly-once OUTPUT semantics.

    foreachBatch itself is at-least-once: after a crash between "sink
    ran" and "offsets committed", the SAME (batch_df, batch_id) is
    re-delivered on restart. Exactly-once therefore has to come from
    the sink being idempotent per batch_id — here each batch overwrites
    its own deterministic ``batch_id=N`` directory, so re-delivery
    rewrites identical bytes instead of appending duplicates. (The
    built-in file sink gets the same guarantee from its _spark_metadata
    transaction log; use this pattern for sinks that lack one, e.g.
    JDBC upserts keyed on (batch_id, pk).)

    Evidence: ``tests/test_streaming_sinks.py::
    test_idempotent_sink_overwrites_on_redelivery`` kills a completed
    run's last commit (the exact crash window), restarts a new query on
    the same checkpoint, and asserts the re-delivered batch overwrote
    its directory with zero duplicate rows.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return sink


def run_stream_once(
    df: DataFrame, *, name: str = "stream_smoke", output_mode: str = "complete"
) -> list:
    """Run a streaming DataFrame to completion on available input via a
    memory sink; returns the materialized rows.

    ``output_mode``: "complete" fits aggregated streams (the default
    pairing with :func:`windowed_counts_stream`); pass "append" for
    non-aggregated streams — Spark rejects complete mode without a
    streaming aggregation.
    """
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.sql(f"SELECT * FROM {name}").collect()


def with_ingest_metrics(df: DataFrame, *, name: str = "ingest_metrics") -> DataFrame:
    """Attach named observed metrics to a (batch or streaming) frame:
    row count, distinct-source count sketch, and total word volume.

    ``observe`` computes the aggregates ON THE EXISTING PASS over the
    data — no extra job, no second scan — and surfaces them per
    micro-batch through ``StreamingQueryProgress.observedMetrics`` (or
    via a ``QueryExecutionListener`` in batch). This is the production
    monitoring seam: ingestion rate, per-batch volume, and data-quality
    counters come from the pipeline itself rather than a parallel
    metrics query that can drift from what was actually written.
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("source").alias("n_sources"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_words"),
    )


class CollectingProgressListener:
    """Minimal ``StreamingQueryListener`` that records per-batch
    progress (rows/sec, batch id, observed metrics) — the hook a real
    deployment points at its metrics backend (StatsD/Prometheus).

    Implemented lazily against ``pyspark.sql.streaming.listener`` so
    importing this module costs nothing when streaming is unused.
    """

    def __new__(cls):
        from pyspark.sql.streaming.listener import StreamingQueryListener

        class _Listener(StreamingQueryListener):
            def __init__(self) -> None:
                self.progress: list[dict] = []

            def onQueryStarted(self, event) -> None:  # noqa: N802
                pass

            def onQueryProgress(self, event) -> None:  # noqa: N802
                p = event.progress
                self.progress.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "observed": {
                            k: v.asDict() if hasattr(v, "asDict") else dict(v)
                            for k, v in (p.observedMetrics or {}).items()
                        },
                    }
                )

            def onQueryIdle(self, event) -> None:  # noqa: N802
                pass

            def onQueryTerminated(self, event) -> None:  # noqa: N802
                pass

        return _Listener()


def cdc_materialize_stream(
    events: DataFrame,
    root: str,
    *,
    key: str = "user_id",
    retain: int = 2,
):
    """Continuous CDC materialization: maintain a latest-row-per-key
    snapshot TABLE from the event stream, committed per micro-batch
    into a manifest table (sources/sinks.py) — streaming upsert with
    dataset versioning in one piece.

    Each batch merges the current snapshot with the new rows and keeps
    the latest (ts, event_id) per key; the result commits as a fresh
    generation via the atomic pointer swap, and ``retain`` generations
    stay readable (``manifest_table_read(generation=...)``), so every
    training run can pin the exact snapshot it consumed.

    Exactly-once without sink-side bookkeeping: latest-wins merge is
    IDEMPOTENT — re-delivering a batch after a crash between sink and
    offset commit re-merges rows that are already reflected, yielding
    a byte-identical snapshot (same argument as the dedup sink's
    redelivery test, one structural level up).

    Returns the DataStreamWriter (caller starts it with a checkpoint).
    """
    from pyspark.sql.window import Window

    from ..sources.sinks import is_manifest_table, manifest_table_read
    from ..sources.sinks import manifest_table_write

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df
        if is_manifest_table(root):
            fresh = manifest_table_read(spark, root).unionByName(fresh)
        w = Window.partitionBy(key).orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        snap = (
            fresh.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        manifest_table_write(snap, root, retain=retain)

    return events.writeStream.foreachBatch(sink).outputMode("update")
