"""Stateful streaming operator tests (X8): session windows, in-stream
dedup, arbitrary-state running aggregates."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from vectordb_migrator_spark.streaming.stateful import (
    running_user_stats,
    session_window_stats,
    streaming_dedup_by_id,
)

_SCHEMA = "user_id long, ts timestamp, value double"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_session_window_batch_semantics(spark):
    """An event exactly gap after the previous one MERGES (new session
    only when the gap is strictly exceeded); end = last + gap."""
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 10:20:00"), 2.0),  # within 30m → same
            (1, _ts("2024-01-01 10:50:00"), 3.0),  # exactly +30m → same
            (1, _ts("2024-01-01 11:20:01"), 4.0),  # +30m01s → NEW
            (2, _ts("2024-01-01 00:00:00"), 9.0),
        ],
        _SCHEMA,
    )
    out = {
        (r["user_id"], r["session_start"].isoformat()): (
            r["session_end"].isoformat(),
            r["n_events"],
            r["total_value"],
        )
        for r in session_window_stats(df, gap="30 minutes").collect()
    }
    assert out[(1, "2024-01-01T10:00:00")] == ("2024-01-01T11:20:00", 3, 6.0)
    assert out[(1, "2024-01-01T11:20:01")] == ("2024-01-01T11:50:01", 1, 4.0)
    assert out[(2, "2024-01-01T00:00:00")] == ("2024-01-01T00:30:00", 1, 9.0)


def test_streaming_session_window(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 10:10:00"), 2.0),
            (1, _ts("2024-01-01 12:00:00"), 4.0),
        ],
        _SCHEMA,
    ).write.parquet(src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        session_window_stats(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sess_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_complete ORDER BY session_start").collect()
    assert [(r["n_events"], r["total_value"]) for r in rows] == [(2, 3.0), (1, 4.0)]


def test_streaming_dedup_by_id(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "id long, ts timestamp, payload string"
    spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 10:00:05"), "a-dup"),
            (2, _ts("2024-01-01 10:01:00"), "b"),
            (2, _ts("2024-01-01 10:01:00"), "b-dup"),
            (3, _ts("2024-01-01 10:02:00"), "c"),
        ],
        schema,
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_dedup_by_id(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT id FROM dedup_sink ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2, 3]


def test_running_user_stats_across_batches(spark, tmp_path):
    """Two files + maxFilesPerTrigger=1 → two micro-batches; the state
    must carry: the second emission is cumulative over both."""
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0), (1, _ts("2024-01-01 10:01:00"), 5.0)],
        _SCHEMA,
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, _ts("2024-01-01 10:02:00"), 2.0)], _SCHEMA
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM running_sink ORDER BY n_events"
    ).collect()
    # one emission per micro-batch that contained user 1; the LAST one
    # is cumulative over all three events
    final = rows[-1]
    assert final["n_events"] == 3
    assert final["total_value"] == 8.0
    assert final["max_value"] == 5.0


def test_stream_interval_join(spark, tmp_path):
    """Purchases attributed to clicks within the lookback window, as a
    real stream-stream join with bounded state."""
    from vectordb_migrator_spark.streaming.stateful import stream_interval_join

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100.0)], _SCHEMA
    ).write.parquet(lsrc)
    spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:45:00"), 1.0),   # within 30m ✓
            (1, _ts("2024-01-01 09:20:00"), 2.0),   # too old ✗
            (1, _ts("2024-01-01 10:05:00"), 3.0),   # after purchase ✗
            (2, _ts("2024-01-01 09:59:00"), 4.0),   # other key ✗
        ],
        _SCHEMA,
    ).write.parquet(rsrc)
    l_stream = spark.readStream.schema(_SCHEMA).parquet(lsrc)
    r_stream = spark.readStream.schema(_SCHEMA).parquet(rsrc)
    q = (
        stream_interval_join(l_stream, r_stream, lookback="30 minutes")
        .writeStream.format("memory")
        .queryName("ij_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, value, r_value FROM ij_sink").collect()
    assert [(r["user_id"], r["value"], r["r_value"]) for r in rows] == [
        (1, 100.0, 1.0)
    ]


def test_running_user_stats_tws_across_batches(spark, tmp_path):
    """transformWithStateInPandas twin of running_user_stats: state
    (a typed ValueState) must carry across micro-batches.

    Spark's transformWithState driver worker speaks a protobuf-based
    state protocol; this container ships no google.protobuf, so the
    runtime path can only execute where that dependency exists (the
    operator's plan construction is still exercised below)."""
    from vectordb_migrator_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    # plan construction works regardless of the protobuf dependency
    batch_plan = running_user_stats_tws(
        spark.createDataFrame([], _SCHEMA), state_ttl="1 hour"
    )
    assert batch_plan.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,"
        "total_value:double,max_value:double>"
    )
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server requires protobuf",
    )

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0), (1, _ts("2024-01-01 10:01:00"), 5.0)],
        _SCHEMA,
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, _ts("2024-01-01 10:02:00"), 2.0)], _SCHEMA
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        running_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("running_tws_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM running_tws_sink ORDER BY n_events"
    ).collect()
    final = rows[-1]
    assert final["n_events"] == 3
    assert final["total_value"] == 8.0
    assert final["max_value"] == 5.0
