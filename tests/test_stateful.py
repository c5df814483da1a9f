"""Custom stateful streaming (applyInPandasWithState) sessionization test."""

from __future__ import annotations

import datetime as dt

from data_ingestion_s3_to_parquet_spark.streaming.stateful import sessionize_stateful
from data_ingestion_s3_to_parquet_spark.streaming.stream import EVENTS_STREAM_SCHEMA


def test_stateful_sessionize_gap_and_terminal(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two events 5min apart, then a 2h gap, then one more
        (1, base, 1, "click", 1.0),
        (2, base + dt.timedelta(minutes=5), 1, "view", 2.0),
        (3, base + dt.timedelta(hours=2), 1, "click", 4.0),
        # user 2: an 'error' closes the session immediately
        (4, base, 2, "click", 1.0),
        (5, base + dt.timedelta(minutes=1), 2, "error", 8.0),
        (6, base + dt.timedelta(minutes=2), 2, "view", 16.0),
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).repartition(1).write.parquet(src)

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    sessions = sessionize_stateful(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT * FROM stateful_sessions ORDER BY user_id, session_start"
    ).collect()

    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)

    # user 1: the first session (2 events) closed by the 2h gap
    u1 = by_user[1]
    assert u1[0].n_events == 2
    assert u1[0].sum_value == 3.0
    assert u1[0].closed_by == "gap"
    assert u1[0].session_start == base
    # session end = last event + 30-minute gap
    assert u1[0].session_end == base + dt.timedelta(minutes=35)
    # user 2: terminal error closed a 2-event session mid-stream
    u2 = by_user[2]
    assert u2[0].n_events == 2
    assert u2[0].sum_value == 9.0
    assert u2[0].closed_by == "terminal"
