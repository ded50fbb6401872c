"""Structured Streaming forms of the event operators: the streaming
windowed aggregation must produce exactly the batch plan's result when
drained with an availableNow trigger (the reference has no streaming at
all — SURVEY.md §1.5/§2.10 — so batch-equivalence is the spec)."""

import pytest

from lynxkite_spark.streaming.events import (
    streaming_event_counts,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_streaming_matches_batch_windowed_counts(spark, tmp_path):
    # the file stream source wants a directory of files
    import shutil

    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    shutil.copy(EVENTS, str(src_dir / "part-0.parquet"))

    batch = windowed_event_counts(spark.read.parquet(EVENTS), window="1 hour")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }

    stream = streaming_event_counts(
        spark, str(src_dir), SCHEMA, window="1 hour", watermark="2 hours"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM stream_counts").collect()
    }
    assert set(got) == set(expected)
    for k, (n, s) in expected.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(s, rel=1e-12)


def test_stateful_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: the CLOSED sessions
    emitted by the drained stream must match the batch sessionizer's
    non-final sessions per user (the open session stays in state)."""
    import shutil

    from pyspark.sql import functions as F

    from lynxkite_spark.streaming.events import sessionize, streaming_sessionize

    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    shutil.copy(EVENTS, str(src_dir / "part-0.parquet"))

    batch = sessionize(spark.read.parquet(EVENTS), gap_minutes=30)
    per_session = (
        batch.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    last_session = {}
    for r in per_session:
        last_session[r["user_id"]] = max(
            last_session.get(r["user_id"], 0), r["session_id"]
        )
    expected = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in per_session
        if r["session_id"] < last_session[r["user_id"]]  # closed only
    }

    stream = streaming_sessionize(spark, str(src_dir), SCHEMA, gap_minutes=30)
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }
    assert got == expected
