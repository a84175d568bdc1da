"""Event-time windows run IDENTICALLY in batch and Structured Streaming:
the same operator function, fed by readStream over the events parquet,
must converge to the batch result (complete-mode memory sink)."""

import shutil

import pytest


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    """File-stream sources need a DIRECTORY; stage the single parquet
    file into one."""
    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(src, d / "part-0.parquet")
    return str(d)


def test_tumbling_stream_equals_batch(spark, events_path):
    from byzer_retrieval_spark.streaming.windows import tumbling_event_counts

    batch_ev = spark.read.parquet(events_path)
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_event_counts(batch_ev).collect()
    }

    stream_ev = (
        spark.readStream.schema(batch_ev.schema).parquet(events_path)
    )
    assert stream_ev.isStreaming
    q = (
        tumbling_event_counts(stream_ev)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
    finally:
        q.stop()
    assert got == batch
    assert len(got) > 0


def test_session_windows_stream_runs(spark, events_path):
    """session_window aggregation accepts a streaming source (watermark
    attached) and produces the batch session set in complete mode."""
    from byzer_retrieval_spark.streaming.windows import session_windows

    batch_ev = spark.read.parquet(events_path)
    batch = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in session_windows(batch_ev).collect()
    }
    stream_ev = spark.readStream.schema(batch_ev.schema).parquet(events_path)
    q = (
        session_windows(stream_ev)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in spark.sql("SELECT * FROM sessions_test").collect()
        }
    finally:
        q.stop()
    assert got == batch
    assert len(got) > 0
